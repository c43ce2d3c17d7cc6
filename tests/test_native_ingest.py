"""Native C++ ingest vs NumPy fallback parity (reference C6/C7 analog)."""

import numpy as np
import pytest

from ycnr_tpu.native import get_lib, parse_ratings_native


@pytest.fixture(scope="module")
def lib():
    lib = get_lib()
    if lib is None:
        pytest.skip("no g++ toolchain; NumPy fallback covers functionality")
    return lib


def test_count_and_parse_tab(tmp_path, lib):
    p = tmp_path / "u.data"
    rows = [(1, 10, 4.0), (2, 11, 3.5), (7, 10, 1.0)]
    p.write_text("".join(f"{u}\t{i}\t{r}\t999\n" for u, i, r in rows))
    assert lib.ycnr_count_rows(str(p).encode()) == 3
    u, i, r = parse_ratings_native(str(p), "\t")
    np.testing.assert_array_equal(u, [1, 2, 7])
    np.testing.assert_array_equal(i, [10, 11, 10])
    np.testing.assert_allclose(r, [4.0, 3.5, 1.0])


def test_parse_dat_and_csv(tmp_path, lib):
    p = tmp_path / "ratings.dat"
    p.write_text("3::7::5::111\n4::2::2.5::111\n")
    u, i, r = parse_ratings_native(str(p), "::")
    np.testing.assert_array_equal(u, [3, 4])
    np.testing.assert_allclose(r, [5.0, 2.5])

    p = tmp_path / "ratings.csv"
    p.write_text("userId,movieId,rating,timestamp\n8,1,3.0,1\n9,2,4.5,1\n")
    u, i, r = parse_ratings_native(str(p), ",")
    np.testing.assert_array_equal(u, [8, 9])
    np.testing.assert_allclose(r, [3.0, 4.5])


def test_parse_no_trailing_newline(tmp_path, lib):
    p = tmp_path / "u.data"
    p.write_text("1\t2\t3.0\t9\n4\t5\t1.5\t9")  # unterminated last line
    u, i, r = parse_ratings_native(str(p), "\t")
    assert len(u) == 2 and r[1] == 1.5


def test_native_pack_matches_python(lib, monkeypatch):
    """build_blocked_csr with and without the native fill must agree."""
    from ycnr_tpu.data.synthetic import synthetic_ratings
    from ycnr_tpu.ops import layout as L

    u, i, r = synthetic_ratings(80, 50, 3000, seed=5)
    a = L.build_blocked_csr(u, i, r, 80, 50, 8, 64)

    import ycnr_tpu.native as native

    monkeypatch.setattr(native, "pack_chunks_native",
                        lambda *args, **kw: False)
    b = L.build_blocked_csr(u, i, r, 80, 50, 8, 64)
    for fa, fb in zip(a, b):
        np.testing.assert_array_equal(np.asarray(fa), np.asarray(fb))


def test_parse_missing_file(lib):
    with pytest.raises(FileNotFoundError):
        parse_ratings_native("/definitely/not/here.csv", ",")


def test_id_maps_roundtrip(tmp_path, lib):
    from ycnr_tpu.data.movielens import load_movielens
    from ycnr_tpu.data.store import RatingsStore

    p = tmp_path / "u.data"
    p.write_text("10\t200\t4.0\t1\n99\t200\t3.0\t1\n10\t333\t5.0\t1\n")
    u, i, r, nu, ni, umap, imap = load_movielens(str(p), return_maps=True)
    assert nu == 2 and ni == 2
    np.testing.assert_array_equal(umap, [10, 99])
    np.testing.assert_array_equal(imap, [200, 333])
    # densified indices round-trip through the maps
    np.testing.assert_array_equal(umap[u], [10, 99, 10])
    store = RatingsStore(str(tmp_path / "s"))
    store.set_id_maps(umap, imap)
    store.append(u, i, r)
    m = RatingsStore(str(tmp_path / "s")).id_maps()
    np.testing.assert_array_equal(m[0], umap)
    np.testing.assert_array_equal(m[1], imap)


def test_parse_truncated_last_line(tmp_path, lib):
    """A bare trailing id with no separator used to read past the buffer."""
    p = tmp_path / "trunc.data"
    p.write_text("1\t10\t4.0\t999\n2\t11\t3.5\t999\n42")
    u, i, r = parse_ratings_native(str(p), "\t")
    np.testing.assert_array_equal(u, [1, 2])
    np.testing.assert_array_equal(i, [10, 11])


def test_parse_skips_malformed_midfile(tmp_path, lib):
    """One bad row used to silently truncate everything after it."""
    p = tmp_path / "bad.data"
    p.write_text("1\t10\t4.0\n???garbage???\n2\t11\t3.5\n")
    u, i, r = parse_ratings_native(str(p), "\t")
    np.testing.assert_array_equal(u, [1, 2])
    np.testing.assert_array_equal(i, [10, 11])


def test_parse_case_insensitive_header(tmp_path, lib):
    """'userID,...' headers used to be parsed as a data row / break row 0."""
    p = tmp_path / "hdr.csv"
    p.write_text("userID,movieID,rating,timestamp\n5,3,2.0,111\n")
    u, i, r = parse_ratings_native(str(p), ",")
    np.testing.assert_array_equal(u, [5])
    np.testing.assert_array_equal(i, [3])


def test_parse_all_garbage_falls_back(tmp_path, lib):
    """A file with content but zero parseable rows returns None so the
    caller uses the tolerant Python parser, not an empty dataset."""
    p = tmp_path / "junk.data"
    p.write_text("hello\nworld\n")
    assert parse_ratings_native(str(p), "\t") is None


def test_pack_bits_native_matches_numpy(lib):
    from ycnr_tpu.native import pack_bits_native

    rng = np.random.default_rng(7)
    nu, ni = 60, 90
    u = rng.integers(0, nu, 700).astype(np.int32)
    i = rng.integers(0, ni, 700).astype(np.int32)
    fast = pack_bits_native(u, i, nu, ni)
    assert fast is not None
    W = (ni + 31) // 32
    ref = np.zeros((nu + 1, W), np.uint32)
    np.bitwise_or.at(ref, (u, i // 32),
                     (np.uint32(1) << (i % 32).astype(np.uint32)))
    np.testing.assert_array_equal(fast, ref)
    assert fast.dtype == np.uint32 and fast.shape == (nu + 1, W)
