from ycnr_tpu.ops.layout import BlockedCSR, build_blocked_csr, pad_coo  # noqa: F401
