from ycnr_tpu.cli import main

main()
