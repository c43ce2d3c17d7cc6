"""Fused Pallas serving scorer — the "top-10 recs/sec" hot path, TPU-first.

The reference's serving path scores `U[u]·Vᵀ`, masks rated items, takes top-N
(SURVEY.md C13, call stack 3.5). The XLA path (`eval/recommend.py`) does this
exactly but materializes the full [U_B, M] float32 score tensor in HBM and
reads it back twice (mask+segmax pass, then candidate extraction) — measured
~1.7 ms per 1024×26880 block on v5e, of which the matmul itself is 1.0 ms.
At ML-20M scale one serving pass moves ~60 GB of score traffic.

This kernel fuses matmul + bias + rated-mask + 128-item segment-max in VMEM,
so the f32 score tensor never touches HBM. What leaves the kernel per block:

* ``segmax`` [U_B, S] f32 — exact per-segment maxima of the masked scores
  (drives the top-n *segment* choice, so segment selection is exact), and
* ``s3``   [U_B, S, 128] bf16 (or f32) — the masked scores, stored compact
  for the candidate-extraction einsum.

With bf16 score storage a serving pass moves ~4x fewer score bytes and the
matmul runs from bf16 operands at f32 accumulation. Within a winning segment,
candidate ordering resolves at bf16 precision (~0.4% relative); ``segmax`` is
computed from the f32 scores *before* the bf16 round-trip, so which segments
compete is exact. ``score_bf16=False`` keeps the score buffer f32 end-to-end
(inputs still bf16). Returned values are the stored scores plus an exact-f32
``mu + b_u`` rebias.

Layout of the kernel grid: ``(user_tiles, item_chunks)`` with the chunk axis
innermost, so V streams through VMEM once per user tile while the user rows
and rated-bit words stay resident. The rated mask rides the packed uint32
bitfield from ``eval.recommend.build_rated_bits`` and is unpacked in-kernel,
never as a full boolean tensor in HBM.

In-kernel bitfield unpack without relayouts: ``pltpu.repeat`` *tiles* its
input (``[w0..wn, w0..wn, ...]``), so a word-major bitfield would need a
lane-expanding reshape. Instead the *items are permuted*: kernel item slot
``j`` of a chunk scores catalog item ``(j % WC)*32 + (j // WC)`` (a 64x32
transpose per chunk, WC = words/chunk), which makes the tiled word vector
``rep[j] = w[j % WC]`` exactly the word holding slot j's bit, at bit position
``j // WC``. Top-n is permutation-invariant (segments are just 128-item
groups — they never needed to be contiguous catalog ranges); V/bi are
permuted once per serving pass and returned item ids are decoded through the
inverse permutation at the end.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -3.0e38  # matches eval.recommend.NEG_INF (kept local: import cycle)

SEG_LEN = 128  # score segment length == one lane row; fixed by the layout


def _chunk_perm(m_pad: int, ic: int) -> np.ndarray:
    """perm[j] = catalog item scored at kernel slot j (see module doc)."""
    wc = ic // 32
    j = np.arange(m_pad, dtype=np.int64)
    c, jj = j // ic, j % ic
    return (c * ic + (jj % wc) * 32 + (jj // wc)).astype(np.int32)


def _score_block_kernel(rows_ref, v_ref, bi_ref, bits_ref,
                        segmax_ref, s3_ref, *, sc):
    """One (user-tile, item-chunk) cell: masked scores -> segmax + s3.

    rows [TU, k] bf16 | v [IC, k] bf16 | bi [1, IC] f32 | bits [TU, 4*sc] i32
    segmax [TU, sc] f32 | s3 [TU, sc, 128] bf16/f32. v/bi arrive in permuted
    item order, so slot j's rated bit is word ``j % WC``, position ``j // WC``
    — and pltpu.repeat's tile semantics deliver exactly word ``j % WC``.
    """
    tu = rows_ref.shape[0]
    ic = v_ref.shape[0]
    wc = 4 * sc
    s = lax.dot_general(rows_ref[...], v_ref[...],
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)  # [TU, IC]
    s = s + bi_ref[...]  # [1, IC] broadcasts over users
    rep = pltpu.repeat(bits_ref[...], 32, axis=1)  # rep[:, j] = w[j % WC]
    sh = lax.broadcasted_iota(jnp.int32, (tu, ic), 1) // wc
    bit = lax.shift_right_logical(rep, sh) & 1
    s = jnp.where(bit != 0, NEG_INF, s)
    s3 = s.reshape(tu, sc, SEG_LEN)
    # segmax leaves transposed [sc, TU]: a (sc, tu) output block satisfies
    # the (8, 128)-divisibility rule where (tu, sc) would not. s3 leaves 3D
    # (a 2D [tu, ic] block is ~7% faster in-kernel but XLA then pays a real
    # copy for the [U_B, S, 128] reshape the extraction needs — measured
    # +26 ms per ML-20M pass, a net loss)
    segmax_ref[...] = s3.max(axis=2).T
    s3_ref[...] = s3.astype(s3_ref.dtype)


@partial(jax.jit,
         static_argnames=("sc", "tu", "score_bf16", "interpret", "vma"))
def _fused_scores(rows, vp, bip, bits, *, sc, tu, score_bf16, interpret,
                  vma=None):
    """All masked scores for one layout block, segment-reduced.

    rows [U_B, k] bf16, vp [M_pad, k] bf16, bip [1, M_pad] f32,
    bits [U_B, 4*S_pad] int32 -> (segmax_T [S_pad, U_B] f32,
    s3 [U_B, S_pad, 128] bf16|f32).

    vma: mesh axis names the outputs vary over — required when called
    inside a ``shard_map`` with ``check_vma=True`` (pallas outputs carry
    no varying-across-mesh info of their own).
    """
    u_b, k = rows.shape
    m_pad = vp.shape[0]
    ic = sc * SEG_LEN
    nc = m_pad // ic
    s_pad = m_pad // SEG_LEN
    gu = -(-u_b // tu)
    sd = jnp.bfloat16 if score_bf16 else jnp.float32
    vma = frozenset(vma) if vma else None
    return pl.pallas_call(
        partial(_score_block_kernel, sc=sc),
        grid=(gu, nc),  # chunk axis innermost: V streams, rows/bits stay
        in_specs=[
            pl.BlockSpec((tu, k), lambda u, c: (u, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ic, k), lambda u, c: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ic), lambda u, c: (0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tu, 4 * sc), lambda u, c: (u, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((sc, tu), lambda u, c: (c, u),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tu, sc, SEG_LEN), lambda u, c: (u, c, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((s_pad, u_b), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((u_b, s_pad, SEG_LEN), sd, vma=vma),
        ],
        interpret=interpret,
    )(rows, vp, bip, bits)


def fused_supported(n_items: int, n: int, sc: int = 32) -> bool:
    """Shape gate: the two-level select needs more segments than n, and the
    VMEM-resident chunk math assumes a nontrivial catalog."""
    s = -(-(n_items + 1) // SEG_LEN)
    return s > n and n <= 64


def fused_topn_core(U, V, bu, bi, mu, entity_ids, rated_bits, n: int, *,
                    sc: int = 32, tu: int = 256, score_bf16: bool = True,
                    interpret=None, vma=None):
    """Traced core of the fused scorer (no jit): masked top-n over every
    block of a serving layout. Callable from inside ``shard_map`` with a
    local U/bu shard and a replicated (or all-gathered cat-space) V/bi —
    ``entity_ids`` index into U exactly as in ``eval.recommend.topn_block``.

    entity_ids [NB, U_B] int32, rated_bits [NB, U_B, W] uint32 (from
    ``build_rated_bits``) -> (ids [NB, U_B, n] int32 item/column indices,
    vals [NB, U_B, n] f32).
    """
    if interpret is None:  # no Mosaic off-TPU: run the kernel interpreted
        interpret = jax.default_backend() != "tpu"
    w = rated_bits.shape[-1]
    m = w * 32
    s = m // SEG_LEN
    if s <= n:
        raise ValueError("catalog too small for the fused path; "
                         "use the exact scorer")
    tu = min(tu, entity_ids.shape[-1])  # tiny blocks: one full-height tile
    s_pad = -(-s // sc) * sc
    m_pad = s_pad * SEG_LEN
    w_pad = s_pad * 4
    k = U.shape[1]
    perm = jnp.asarray(_chunk_perm(m_pad, sc * SEG_LEN))
    ub16 = U.astype(jnp.bfloat16)
    vp = jnp.zeros((m_pad, k), jnp.bfloat16)
    vp = vp.at[: V.shape[0]].set(V.astype(jnp.bfloat16))
    vp = vp[perm]  # kernel slot j scores catalog item perm[j]
    bip = jnp.zeros((1, m_pad), jnp.float32)
    bip = bip.at[0, : bi.shape[0]].set(bi)
    bip = bip[:, perm]
    bits_i = lax.bitcast_convert_type(rated_bits, jnp.int32)
    if w_pad > w:  # pad words are all-ones: every pad column stays masked
        bits_i = jnp.pad(bits_i, ((0, 0), (0, 0), (0, w_pad - w)),
                         constant_values=-1)
    sd = jnp.bfloat16 if score_bf16 else jnp.float32

    def body(_, xs):
        eids, bits_b = xs
        rows = ub16[eids]  # [U_B, k] bf16 gather (half the f32 bytes)
        segmax_t, s3 = _fused_scores(rows, vp, bip, bits_b, sc=sc, tu=tu,
                                     score_bf16=score_bf16,
                                     interpret=interpret, vma=vma)
        _, top_seg = lax.top_k(segmax_t.T, n)  # exact: f32 pre-round maxima
        # extract the n winning segments with a one-hot matmul (streams s3
        # at full bandwidth; row gathers measured ~13 GB/s on v5e)
        oh = jax.nn.one_hot(top_seg, s_pad, dtype=sd)
        cand = jnp.einsum("uns,usl->unl", oh, s3,
                          preferred_element_type=jnp.float32,
                          precision=lax.Precision.HIGHEST)
        v, loc = lax.top_k(cand.reshape(-1, n * SEG_LEN), n)
        seg_sel = jnp.take_along_axis(top_seg, loc // SEG_LEN, axis=1)
        slots = seg_sel * SEG_LEN + (loc % SEG_LEN)
        # decode kernel slots back to catalog items; the clamp keeps ids
        # within the PADDED score/bits width m (>= n_items), not within the
        # catalog — NEG_INF-tail picks (users with < n unrated items) can
        # still decode to ids in [n_items, m). Callers must drop entries
        # with scores <= NEG_INF/2 before id-map lookups, the same contract
        # as the exact scorer (eval/recommend.py); every in-repo caller does
        items = jnp.minimum(perm[slots], m - 1)
        vals = v + (mu + bu[eids])[:, None]  # exact f32 rebias
        return None, (items.astype(jnp.int32), vals)

    _, (ids, vals) = lax.scan(body, None, (entity_ids, bits_i))
    return ids, vals


@partial(jax.jit,
         static_argnames=("n", "sc", "tu", "score_bf16", "interpret"))
def fused_topn_blocks(state, entity_ids, rated_bits, n: int, *, sc: int = 32,
                      tu: int = 256, score_bf16: bool = True,
                      interpret=None):
    """Masked top-n over every block of a serving layout, fused scorer.

    Drop-in for ``eval.recommend._topn_blocks``'s fast path: same inputs
    (``entity_ids`` [NB, U_B] and packed ``rated_bits`` [NB, U_B, W] from
    ``build_rated_bits``), same outputs (ids [NB, U_B, n] int32, vals
    [NB, U_B, n] f32). Selection: exact top-n *segments* from f32 segment
    maxima, then top-n within the n*128 candidates at score-buffer precision.
    """
    return fused_topn_core(state.U, state.V, state.bu, state.bi, state.mu,
                           entity_ids, rated_bits, n, sc=sc, tu=tu,
                           score_bf16=score_bf16, interpret=interpret)
