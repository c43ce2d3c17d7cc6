"""Compact SGD wire (ops/sgd_wire.py): host round-trip, device-decode
parity, and the four-path trajectory equivalence (flat/compact x
resident/streamed — SURVEY.md §3.3's portioned-streaming analog for the
SGD trainer)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ycnr_tpu.data.synthetic import synthetic_ratings
from ycnr_tpu.models.base import state_from_numpy
from ycnr_tpu.models.sgd_stream import (
    StreamSGD,
    _compact_epoch_ooc,
    prepare_stream_sgd,
    sgd_stream_epoch,
    sgd_stream_epoch_pinned,
)
from ycnr_tpu.ops.sgd_wire import (
    CompactStreamSGD,
    compact_from_stream,
    compact_resident,
    decode_compact,
    put_compact,
    sgd_wire_budget,
)

DT = jnp.float64
NU, NI, NNZ, B = 90, 50, 1200, 64


def _state(nu=NU, ni=NI, k=6, seed=0, mu=3.5):
    rng = np.random.default_rng(seed)
    st = state_from_numpy(rng.normal(0, 0.1, (nu, k)),
                          rng.normal(0, 0.1, (ni, k)), dtype=DT)
    return st._replace(mu=jnp.asarray(mu, DT))


def _clone(st):
    return jax.tree.map(jnp.copy, st)


def _host_stream(grad_mode="capped", seed=3, **kw):
    u, i, r = synthetic_ratings(NU, NI, NNZ, true_rank=3, seed=seed, **kw)
    data, _ = prepare_stream_sgd(u, i, r, B, NU, NI, seed=7, dtype=DT,
                                 grad_mode=grad_mode, device=False)
    return data


@pytest.mark.parametrize("grad_mode", ["capped", "mean", "sum"])
def test_roundtrip_exact(grad_mode):
    """compact_from_stream(validate=True) re-decodes on host and asserts
    exact equality with every flat array (weights included) — so reaching
    the return IS the round-trip assertion. Also pin the byte win."""
    data = _host_stream(grad_mode)
    comp = compact_from_stream(data, NI)
    flat_bytes = sum(np.asarray(getattr(data, n)).nbytes
                     for n in ("ul", "ib", "rb", "wu", "wi", "u_lo"))
    assert comp.nbytes < 0.5 * flat_bytes
    assert comp.rating_kind == "half"  # rating_levels=True -> half-stars
    # decode_compact really does return the flat arrays verbatim
    dul, dib, drb, dwu, dwi = decode_compact(comp, np.float64)
    np.testing.assert_array_equal(dib, np.asarray(data.ib))
    np.testing.assert_array_equal(dwu, np.asarray(data.wu))


def test_roundtrip_raw_ratings():
    """Continuous ratings fall off the int8 half-star wire onto f32 raw."""
    data = _host_stream(rating_levels=False)
    # f64 stream of f32-representable values -> raw wire, still exact
    comp = compact_from_stream(data, NI)
    assert comp.rating_kind == "raw"
    # truly-f64 ratings can't ride the f32 wire: loud, not lossy
    bad = data._replace(rb=np.asarray(data.rb, np.float64)
                        + np.float64(1e-12))
    with pytest.raises(ValueError, match="f32 raw wire"):
        compact_from_stream(bad, NI)


def test_tall_tile_rides_u32():
    """tile > 65,536 widens the local-row column to u32 instead of
    failing — the wire stays valid at any user count."""
    data = _host_stream()
    comp = compact_from_stream(data._replace(tile=65537), NI)
    assert comp.ul.dtype == np.uint32
    assert compact_from_stream(data, NI).ul.dtype == np.uint16


@pytest.mark.parametrize("grad_mode", ["capped", "sum"])
def test_pinned_epoch_bitwise(grad_mode):
    """Pinned-compact epoch == resident flat epoch, bitwise in float64
    (device decode feeds the same _batch_update body)."""
    host = _host_stream(grad_mode)
    comp = put_compact(compact_from_stream(host, NI))
    assert compact_resident(comp)
    dev = host._replace(**{n: jnp.asarray(getattr(host, n)) for n in
                           ("ul", "ib", "rb", "wu", "wi", "u_lo")})
    st0 = _state()
    nb = host.ul.shape[0]
    order = jnp.arange(nb)[::-1]  # a nontrivial batch order
    ref = sgd_stream_epoch(_clone(st0), dev.ul, dev.ib, dev.rb, dev.wu,
                           dev.wi, dev.u_lo, order, 0.02, 0.01, host.tile)
    got = sgd_stream_epoch_pinned(_clone(st0), comp, order, 0.02, 0.01)
    for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(got)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_streamed_compact_epoch_bitwise():
    """Host-streamed compact epoch (chunked, with a padded tail chunk)
    == pinned epoch under the same batch order."""
    host = _host_stream("capped")
    comp = compact_from_stream(host, NI)
    st0 = _state()
    nb = host.ul.shape[0]
    assert nb >= 5
    rng = np.random.default_rng(11)
    order = rng.permutation(nb)
    got = _compact_epoch_ooc(_clone(st0), comp, order, 0.02, 0.01,
                             chunk_batches=4)  # forces a short tail
    ref = sgd_stream_epoch_pinned(_clone(st0), put_compact(comp),
                                  jnp.asarray(order), 0.02, 0.01)
    for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(got)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_trainer_dispatch_all_paths():
    """StreamSGD.epoch routes (format, residency) to the four epoch
    implementations and all four produce the same float64 factors."""
    host = _host_stream("capped")
    comp_host = compact_from_stream(host, NI)
    comp_dev = put_compact(comp_host)
    flat_dev = host._replace(**{n: jnp.asarray(getattr(host, n)) for n in
                                ("ul", "ib", "rb", "wu", "wi", "u_lo")})
    tr = StreamSGD(lam=0.02, lr=0.01, seed=4, grad_mode="capped")
    outs = []
    for data in (flat_dev, host, comp_dev, comp_host):
        st = _clone(_state())
        for e in range(2):
            st = tr.epoch(st, data, e)
        outs.append(st)
    for st in outs[1:]:
        for a, b in zip(jax.tree.leaves(outs[0]), jax.tree.leaves(st)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_budget_model():
    b = sgd_wire_budget(NU, NI, 64, hbm_bytes=15 * 10**9)
    assert 0 < b < 15 * 10**9
    assert sgd_wire_budget(NU, NI, 64, hbm_bytes=10**9) == 0  # reserve wins


def test_nbytes_rate():
    """The wire rate lands in the documented 5-9 B/rating band (padding
    included) for capped mode, ~5 B for sum."""
    for gm, hi in (("capped", 10.0), ("sum", 6.0)):
        data = _host_stream(gm)
        comp = compact_from_stream(data, NI)
        n_pad = comp.ul.size
        assert comp.nbytes / n_pad <= hi


def test_loop_integration(tmp_path):
    """train() with ooc=True + stream SGD builds the compact wire (logged
    to metrics JSONL) and the run converges (RMSE descends)."""
    import json
    import os

    from ycnr_tpu.config import DataConfig, RunConfig, SGDConfig
    from ycnr_tpu.train.loop import train

    cfg = RunConfig(
        name="sgdwire", algorithm="sgd",
        data=DataConfig(source="synthetic", n_users=NU, n_items=NI,
                        n_ratings=NNZ, seed=1),
        sgd=SGDConfig(rank=6, lr=0.02, epochs=3, batch_size=B,
                      method="stream"),
        ooc=True, out_dir=str(tmp_path), seed=0)
    res = train(cfg)
    records = [json.loads(x)
               for x in open(os.path.join(res.out_dir, "metrics.jsonl"))]
    tr = [r["rmse_train"] for r in records if "rmse_train" in r]
    assert tr[-1] < tr[0]  # tiny synthetic overfits test RMSE; train
    #                        descent is the convergence signal here
    wire = [r for r in records if r.get("event") == "sgd_wire"]
    assert wire and wire[0]["format"] == "compact"
    # CPU test devices are tiny; residency is decided by the real budget
    assert isinstance(wire[0]["hbm_pinned"], bool)
