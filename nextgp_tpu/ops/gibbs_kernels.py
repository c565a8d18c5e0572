"""Pallas TPU kernels for the in-block single-site Gibbs scan.

The pure-JAX path expresses the per-locus chain as a lax.scan whose body is
tiny; on TPU each XLA while-loop iteration costs ~10-15us of loop overhead,
which at 50k-600k loci per sweep dwarfs the math (measured 746 ms/sweep at
10k x 49k vs a ~1.2 ms bandwidth roofline). These kernels run the whole
B-locus scan inside one Pallas program with the Gram block in VMEM and the
correction vector u as a register-resident (1, B) carry.

Key optimization: everything per-locus that does not depend on the chain
state is precomputed OUTSIDE the kernel as per-locus coefficients
(engine/samplers/markers.py builds them as fused vector ops over all p
loci). In particular all transcendentals move out:

  Gaussian (BayesPR/LV, functions.jl:124-134):
      beta_new = c + b * pre, with b = iVarE/lhs, c = rss/lhs + z*sqrt(1/lhs)
  BayesB/C indicator (functions.jl:171-173): u < 1/(1+e^t)  <=>
      q0 + q1*rrr^2 < log((1-u)/u), all of q0,q1,w precomputed
  BayesR class scores (functions.jl:253-257): logl_v = q0_v + q1_v*pre^2

so one locus costs one dynamic (1, W) coefficient-row load, one Gram-row
product + reduce, a handful of FMAs, and one lane-masked update of u. The
restore (u_j <- beta_old_j) is folded algebraically into the packed slot 0
(pre = r0 + row@u + gram_jj*beta_old, with u_j still 0 when locus j runs).

Packed layouts (slot 0 gets + r0 added per block by the caller):
  gauss pk (B, 8):  [adj, bold, b, c] (+4 pad)
  bc    pk (B, 8):  [adj, bold, q0, q1, w, b, c] (+1 pad)
  r     pk (B, 8+4K): [adj, bold, unif, mask, pad*4 | q0(K), q1(K), b(K), c(K)]

The kernels consume the same pre-generated random streams as the pure-JAX
samplers, so both paths sample the same chain up to f32 rounding (indicator
decisions can flip only when a draw sits within rounding of the threshold).
CPU tests run with interpret=True.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = jnp.float32


def _lane_iota(B):
    return jax.lax.broadcasted_iota(jnp.int32, (1, B), 1)


def _pack(*cols, width=8):
    cols = [c.astype(F32) for c in cols]
    pk = jnp.stack(cols, axis=1)
    pad = width - pk.shape[1]
    if pad > 0:
        pk = jnp.concatenate([pk, jnp.zeros((pk.shape[0], pad), F32)], axis=1)
    return pk


def _call(kernel, gram, pk, n_extra_out=0, interpret=False):
    B = gram.shape[0]
    outs = [
        jax.ShapeDtypeStruct((B, 1), F32),  # beta
        jax.ShapeDtypeStruct((1, B), F32),  # u
    ] + [jax.ShapeDtypeStruct((B, 1), jnp.int32)] * n_extra_out
    res = pl.pallas_call(
        kernel,
        out_shape=tuple(outs),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM) for _ in outs),
        interpret=interpret,
    )(gram.astype(F32), pk)
    return res


# ------------------------------------------------------------- Gaussian scan


def _gauss_kernel(gram_ref, pk_ref, beta_ref, u_ref):
    B = u_ref.shape[1]
    lane = _lane_iota(B)

    def body(j, u):
        s = pk_ref[pl.ds(j, 1), :][0]
        row = gram_ref[pl.ds(j, 1), :]
        pre = s[0] + jnp.sum(row * u)
        bnew = s[3] + s[2] * pre
        beta_ref[pl.ds(j, 1), 0] = bnew[None]
        return jnp.where(lane == j, s[1] - bnew, u)

    u = jax.lax.fori_loop(0, B, body, jnp.zeros((1, B), F32))
    u_ref[:, :] = u


@jax.jit
def gauss_block_pack(r0_extra, beta_old, z, ivb, mpm, lss, rss, mask, ive):
    """Per-locus coefficients for the Gaussian scan, all-p vectorized.
    r0_extra: additive offset already known pre-sweep (mpm*beta_old)."""
    lhs = mpm * ive + lss + ivb
    invlhs = 1.0 / lhs
    b = jnp.where(mask, ive * invlhs, 0.0)
    c = jnp.where(mask, rss * invlhs + z * jnp.sqrt(invlhs), 0.0)
    return _pack(r0_extra + mpm * beta_old, beta_old, b, c)


def gauss_block_scan(gram, pk_b, interpret=False):
    beta, u = _call(_gauss_kernel, gram, pk_b, 0, interpret)
    return beta[:, 0], u[0]


# ------------------------------------------------------------- BayesB/C scan


def _bc_kernel(gram_ref, pk_ref, beta_ref, u_ref, delta_ref):
    B = u_ref.shape[1]
    lane = _lane_iota(B)

    def body(j, u):
        s = pk_ref[pl.ds(j, 1), :][0]
        row = gram_ref[pl.ds(j, 1), :]
        pre = s[0] + jnp.sum(row * u)
        inc = s[2] + s[3] * pre * pre < s[4]
        bnew = jnp.where(inc, s[6] + s[5] * pre, 0.0)
        beta_ref[pl.ds(j, 1), 0] = bnew[None]
        delta_ref[pl.ds(j, 1), 0] = inc.astype(jnp.int32)[None]
        return jnp.where(lane == j, s[1] - bnew, u)

    u = jax.lax.fori_loop(0, B, body, jnp.zeros((1, B), F32))
    u_ref[:, :] = u


@functools.partial(jax.jit, static_argnames=("common",))
def bc_block_pack(beta_old, z, unif, vb, ivb, mpm, lss, rss, mask, ive, var_e,
                  lp0, lp1, common):
    """BayesB/C coefficients. The indicator u < 1/(1+exp(ld0-ld1)) becomes
    q0 + q1*rrr^2 < log((1-u)/u) (functions.jl:171-173, exact algebra)."""
    mpm_safe = jnp.where(mask, mpm, 1.0)
    v0 = mpm_safe * var_e
    v1 = mpm_safe * mpm_safe * vb + v0
    q0 = -0.5 * (jnp.log(v0) - jnp.log(v1)) + lp0 - lp1
    q0 = jnp.where(mask, q0, jnp.inf)  # padded loci never included
    q1 = -0.5 * (1.0 / v0 - 1.0 / v1)
    w = jnp.log1p(-unif) - jnp.log(unif)
    lhs = mpm_safe * ive + lss + ivb  # ivb = inf when vb == 0 -> b = c = 0
    invlhs = 1.0 / lhs
    b = ive * invlhs
    rss_eff = 0.0 if common else rss  # BayesC omits rhs_ss (functions.jl:219)
    c = rss_eff * invlhs + z * jnp.sqrt(invlhs)
    return _pack(mpm * beta_old, beta_old, q0, q1, w, b, c)


def bc_block_scan(gram, pk_b, interpret=False):
    beta, u, delta = _call(_bc_kernel, gram, pk_b, 1, interpret)
    return beta[:, 0], u[0], delta[:, 0]


# --------------------------------------------------------------- BayesR scan


def _make_r_kernel(K):
    def _r_kernel(gram_ref, pk_ref, beta_ref, u_ref, delta_ref):
        B = u_ref.shape[1]
        lane = _lane_iota(B)
        kiota = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)[0]
        tri = kiota[:, None] <= kiota[None, :]

        def body(j, u):
            s = pk_ref[pl.ds(j, 1), :][0]
            row = gram_ref[pl.ds(j, 1), :]
            pre = s[0] + jnp.sum(row * u)
            q0 = s[8:8 + K]
            q1 = s[8 + K:8 + 2 * K]
            bco = s[8 + 2 * K:8 + 3 * K]
            cco = s[8 + 3 * K:8 + 4 * K]
            logl = q0 + q1 * pre * pre
            logl = logl - jnp.max(logl)
            e = jnp.exp(logl)
            probs = e / jnp.sum(e)
            cum = jnp.sum(jnp.where(tri, probs[:, None], 0.0), axis=0)
            cls = jnp.sum((cum < s[2]).astype(jnp.int32))
            sel = kiota == cls
            bnew = jnp.sum(jnp.where(sel, cco + bco * pre, 0.0))
            beta_ref[pl.ds(j, 1), 0] = bnew[None]
            delta_ref[pl.ds(j, 1), 0] = (
                jnp.where(s[3] != 0, cls + 1, 0).astype(jnp.int32)[None])
            return jnp.where(lane == j, s[1] - bnew, u)

        u = jax.lax.fori_loop(0, B, body, jnp.zeros((1, B), F32))
        u_ref[:, :] = u

    return _r_kernel


@jax.jit
def r_block_pack(beta_old, z, unif, mpm, lss, rss, mask, varc, logpi, ive, var_e):
    """BayesR coefficients: logl_v = q0_v + q1_v*pre^2 with rss folded into
    the additive slot (rhs = (r0 + dot + mpm*bold + rss*varE) * iVarE)."""
    K = varc.shape[0]
    p = beta_old.shape[0]
    nz = varc > 0
    varc_s = jnp.where(nz, varc, 1.0)
    mpm_safe = jnp.where(mask, mpm, 1.0)
    lhs = jnp.where(nz[None, :], mpm_safe[:, None] * ive + lss[:, None] + 1.0 / varc_s[None, :], 0.0)
    lhs_s = jnp.where(nz[None, :], lhs, 1.0)
    invlhs = jnp.where(nz[None, :], 1.0 / lhs_s, 0.0)
    q0 = jnp.where(nz[None, :], -0.5 * jnp.log(varc_s[None, :] * lhs_s), 0.0) + logpi[None, :]
    q1 = 0.5 * invlhs * ive * ive
    bco = jnp.where(mask[:, None], ive * invlhs, 0.0)
    cco = jnp.where(mask[:, None], z[:, None] * jnp.sqrt(invlhs), 0.0)
    adj = mpm * beta_old + rss * var_e
    head = _pack(adj, beta_old, unif, mask.astype(F32))
    return jnp.concatenate(
        [head] + [x.astype(F32) for x in (q0, q1, bco, cco)], axis=1)


def r_block_scan(gram, pk_b, n_classes, interpret=False):
    beta, u, delta = _call(_make_r_kernel(n_classes), gram, pk_b, 1, interpret)
    return beta[:, 0], u[0], delta[:, 0]


# ------------------------------------------------- batched (virtual-shard) scans
#
# V independent block chains advance together: one scan step updates locus j
# of every virtual shard, so the per-step VPU tiles are (V, B) — V=8 fills
# the sublane dimension that the single-chain kernels leave idle. This is
# the on-chip analog of the multi-device sharded schedule (parallel/
# sharded.py): shard v owns contiguous blocks [v*T, (v+1)*T) and the
# residual syncs at block-step boundaries via the summed correction.
#
# Layout: gram arrives locus-major (B, V, B) — pre-arranged at assemble time
# (engine/plan.py vshard storage) so the in-kernel dynamic slice at locus j
# yields a contiguous (V, B) tile with zero per-step transposes; pk is small
# and transposed here. beta/delta accumulate in the carry as (V, B) register
# tiles (single store at the end) instead of per-iteration scatter stores.


def _call_v(kernel, gram_t, pk_t, n_extra_out=0, interpret=False):
    B, V, _ = gram_t.shape
    outs = [
        jax.ShapeDtypeStruct((V, B), F32),  # beta
        jax.ShapeDtypeStruct((V, B), F32),  # u
    ] + [jax.ShapeDtypeStruct((V, B), jnp.int32)] * n_extra_out
    return pl.pallas_call(
        kernel,
        out_shape=tuple(outs),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM) for _ in outs),
        interpret=interpret,
    )(gram_t.astype(F32), pk_t.astype(F32))


def _gauss_kernel_v(gram_ref, pk_ref, beta_ref, u_ref):
    V, B = u_ref.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (V, B), 1)

    def body(j, carry):
        u, beta = carry
        s = pk_ref[pl.ds(j, 1), :, :][0]  # (V, W)
        row = gram_ref[pl.ds(j, 1), :, :][0]  # (V, B)
        pre = s[:, 0] + jnp.sum(row * u, axis=-1)
        bnew = s[:, 3] + s[:, 2] * pre
        sel = lane == j
        u = jnp.where(sel, (s[:, 1] - bnew)[:, None], u)
        beta = jnp.where(sel, bnew[:, None], beta)
        return u, beta

    u, beta = jax.lax.fori_loop(
        0, B, body, (jnp.zeros((V, B), F32), jnp.zeros((V, B), F32))
    )
    beta_ref[:, :] = beta
    u_ref[:, :] = u


def gauss_block_scan_v(gram_t, pk, interpret=False):
    """gram_t locus-major (B,V,B), pk (V,B,8) -> beta (V,B), u (V,B)."""
    pk_t = jnp.swapaxes(pk, 0, 1)  # (B, V, W)
    beta, u = _call_v(_gauss_kernel_v, gram_t, pk_t, 0, interpret)
    return beta, u


def _bc_kernel_v(gram_ref, pk_ref, beta_ref, u_ref, delta_ref):
    V, B = u_ref.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (V, B), 1)

    def body(j, carry):
        u, beta, delta = carry
        s = pk_ref[pl.ds(j, 1), :, :][0]  # (V, W)
        row = gram_ref[pl.ds(j, 1), :, :][0]
        pre = s[:, 0] + jnp.sum(row * u, axis=-1)
        inc = s[:, 2] + s[:, 3] * pre * pre < s[:, 4]
        bnew = jnp.where(inc, s[:, 6] + s[:, 5] * pre, 0.0)
        sel = lane == j
        u = jnp.where(sel, (s[:, 1] - bnew)[:, None], u)
        beta = jnp.where(sel, bnew[:, None], beta)
        delta = jnp.where(sel, inc.astype(jnp.int32)[:, None], delta)
        return u, beta, delta

    u, beta, delta = jax.lax.fori_loop(
        0, B, body,
        (jnp.zeros((V, B), F32), jnp.zeros((V, B), F32), jnp.zeros((V, B), jnp.int32)),
    )
    beta_ref[:, :] = beta
    u_ref[:, :] = u
    delta_ref[:, :] = delta


def bc_block_scan_v(gram_t, pk, interpret=False):
    pk_t = jnp.swapaxes(pk, 0, 1)
    beta, u, delta = _call_v(_bc_kernel_v, gram_t, pk_t, 1, interpret)
    return beta, u, delta


def _make_r_kernel_v(K):
    def _r_kernel_v(gram_ref, pk_ref, beta_ref, u_ref, delta_ref):
        V, B = u_ref.shape
        lane = jax.lax.broadcasted_iota(jnp.int32, (V, B), 1)
        kiota = jax.lax.broadcasted_iota(jnp.int32, (V, K), 1)
        ki = jax.lax.broadcasted_iota(jnp.int32, (K, K), 0)
        kj = jax.lax.broadcasted_iota(jnp.int32, (K, K), 1)
        tri = ki <= kj  # tri[i, k]: class i contributes to cum[k]

        def body(j, carry):
            u, beta, delta = carry
            s = pk_ref[pl.ds(j, 1), :, :][0]  # (V, 8+4K)
            row = gram_ref[pl.ds(j, 1), :, :][0]
            pre = s[:, 0] + jnp.sum(row * u, axis=-1)  # (V,)
            q0 = s[:, 8:8 + K]
            q1 = s[:, 8 + K:8 + 2 * K]
            bco = s[:, 8 + 2 * K:8 + 3 * K]
            cco = s[:, 8 + 3 * K:8 + 4 * K]
            logl = q0 + q1 * (pre * pre)[:, None]  # (V, K)
            logl = logl - jnp.max(logl, axis=-1, keepdims=True)
            e = jnp.exp(logl)
            probs = e / jnp.sum(e, axis=-1, keepdims=True)
            # cumsum via masked sum (cumsum does not lower in Mosaic)
            cum = jnp.sum(jnp.where(tri[None], probs[:, :, None], 0.0), axis=1)
            cls = jnp.sum((cum < s[:, 2:3]).astype(jnp.int32), axis=-1)  # (V,)
            sel_k = kiota == cls[:, None]
            bnew = jnp.sum(jnp.where(sel_k, cco + bco * pre[:, None], 0.0), axis=-1)
            dval = jnp.where(s[:, 3] != 0, cls + 1, 0).astype(jnp.int32)
            sel = lane == j
            u = jnp.where(sel, (s[:, 1] - bnew)[:, None], u)
            beta = jnp.where(sel, bnew[:, None], beta)
            delta = jnp.where(sel, dval[:, None], delta)
            return u, beta, delta

        u, beta, delta = jax.lax.fori_loop(
            0, B, body,
            (jnp.zeros((V, B), F32), jnp.zeros((V, B), F32), jnp.zeros((V, B), jnp.int32)),
        )
        beta_ref[:, :] = beta
        u_ref[:, :] = u
        delta_ref[:, :] = delta

    return _r_kernel_v


def r_block_scan_v(gram_t, pk, n_classes, interpret=False):
    pk_t = jnp.swapaxes(pk, 0, 1)
    beta, u, delta = _call_v(_make_r_kernel_v(n_classes), gram_t, pk_t, 1, interpret)
    return beta, u, delta
