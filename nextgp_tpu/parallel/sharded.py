"""Multi-chip execution: chains x marker-shards over a device mesh.

The TP axis of the design (SURVEY.md §2.6): the blocked genotype matrix is
sharded block-wise along the SNP axis across the `shards` mesh axis; the
residual vector is replicated and every device processes its own current
block each block-step, after which corrections merge with a single psum
(engine/samplers/markers.py carries the psum points via ShardCtx). The
`chains` axis runs independent chains data-parallel; all non-marker stages
are computed redundantly per shard (identical math on replicated inputs —
determinism is the synchronization).

Because per-locus random streams are generated at global length and sliced
per shard, a chain is the same chain whatever the shard count: the
schedule changes (S blocks advance per block-step instead of 1), which is
the documented deviation from the reference's strictly sequential scan
order; with n_shards=1 the sweep is bit-identical to the single-device
engine.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..engine import rng
from ..engine.plan import SweepPlan
from ..engine.sharding import ShardCtx
from ..engine.state import (
    CorrMarkerState,
    CorrRandomState,
    FixedState,
    MarkerState,
    ModelState,
    RandomState,
    ResidualState,
    SparseRandomState,
)
from ..engine.samplers.fixed import sample_fixed_block
from ..engine.samplers.markers import sample_corr_marker_set, sample_marker_set
from ..engine.samplers.random_effects import (
    sample_random_cg,
    sample_random_corr,
    sample_random_uni,
)
from ..engine.samplers.residual import sample_var_e
from ..utils import replace

CHAINS, SHARDS = "chains", "shards"

# fields that mutate during a sweep -> get a leading chains dimension
_CHAIN_FIELDS = {
    ModelState: ("ycorr", "sweep_index"),
    ResidualState: ("var_e",),
    FixedState: ("b",),
    RandomState: ("u", "var_u"),
    SparseRandomState: ("u", "var_u"),
    CorrRandomState: ("u", "var_u"),
    MarkerState: ("beta", "delta", "var_beta", "log_pi", "pi_hat", "annot_prob",
                  "annot_cat", "log_var", "lv_c", "lv_resid", "var_zeta"),
    CorrMarkerState: ("beta", "var_beta"),
}
# MarkerState fields sharded along their leading (block or locus) axis.
# annot_input stays REPLICATED: it is the (static, small) alpha array for
# the RCpi sampleProb gammas, which are drawn at global length and sliced
# per shard so the stream — hence the chain — is shard-invariant.
_SHARD_STATIC = ("mt", "center", "gram", "gram_raw", "mpm", "lhs_ss", "rhs_ss",
                 "mask", "region_id", "annot_nz", "lv_design")
# chain fields additionally sharded along the locus axis
_SHARD_CHAIN = ("beta", "delta", "annot_prob", "annot_cat", "log_var", "lv_resid")


def make_mesh(n_chains: int = 1, n_shards: Optional[int] = None, devices=None) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    if n_shards is None:
        n_shards = devices.size // n_chains
    if n_chains * n_shards != devices.size:
        raise ValueError(f"chains*shards = {n_chains * n_shards} != {devices.size} devices")
    return Mesh(devices.reshape(n_chains, n_shards), (CHAINS, SHARDS))


def _marker_specs(ms: MarkerState, mp) -> MarkerState:
    def spec(field, val):
        if val is None:
            return None
        chain = field in _CHAIN_FIELDS[MarkerState]
        if mp.vshards > 1 and field in ("mt", "center"):
            # vshard storage layout (T, V, B[, n]): split the vshard axis.
            # Device s then owns local chains [s*V/S, (s+1)*V/S) whose global
            # block assignment equals the single-device V-vshard schedule, so
            # the sharded chain is the same chain.
            return P(None, SHARDS, *([None] * (val.ndim - 2)))
        if mp.vshards > 1 and field in ("gram", "gram_raw"):
            # locus-major vshard layout (T, B, V, B)
            return P(None, None, SHARDS, None)
        if field in _SHARD_STATIC:
            return P(SHARDS, *([None] * (val.ndim - 1)))
        if chain and field in _SHARD_CHAIN:
            return P(CHAINS, SHARDS, *([None] * (val.ndim - 2)))
        if chain and field == "var_beta" and mp.n_var == mp.p_pad:
            return P(CHAINS, SHARDS)
        if chain:
            return P(CHAINS, *([None] * (val.ndim - 1)))
        return P(*([None] * val.ndim))

    import dataclasses

    return MarkerState(**{
        f.name: spec(f.name, getattr(ms, f.name)) for f in dataclasses.fields(MarkerState)
    })


def _simple_specs(obj, cls):
    import dataclasses

    chain_fields = _CHAIN_FIELDS[cls]

    def spec(field, val):
        if val is None:
            return None
        if field in chain_fields:
            return P(CHAINS, *([None] * (val.ndim - 1)))
        return P(*([None] * val.ndim))

    return cls(**{f.name: spec(f.name, getattr(obj, f.name)) for f in dataclasses.fields(cls)})


def _corr_specs(cs: CorrMarkerState) -> CorrMarkerState:
    """Corr marker sets shard along the block/locus axis like plain sets:
    device s owns contiguous blocks [s*nb/S, (s+1)*nb/S); the residual is
    replicated and corrections psum at block-step boundaries (the sampler
    is ctx-driven already, markers.py:sample_corr_marker_set)."""
    return CorrMarkerState(
        mt=P(SHARDS, None, None, None),
        center=P(SHARDS, None, None),
        gram=P(SHARDS, None, None, None, None),
        mpm=P(SHARDS, None, None, None),
        mask=P(SHARDS, None),
        region_id=P(SHARDS),
        beta=P(CHAINS, SHARDS, None),
        var_beta=P(CHAINS, None, None, None),
        scale=P(None, None),
    )


def state_specs(plan: SweepPlan, batched: ModelState) -> ModelState:
    return ModelState(
        y=P(None),
        ycorr=P(CHAINS, None),
        e=_simple_specs(batched.e, ResidualState),
        fixed=tuple(_simple_specs(fs, FixedState) for fs in batched.fixed),
        random=tuple(
            _simple_specs(rs, type(rs))
            for rs, rp in zip(batched.random, plan.random)
        ),
        markers=tuple(_marker_specs(ms, mp) for ms, mp in zip(batched.markers, plan.markers)),
        sweep_index=P(CHAINS),
        corr_markers=tuple(_corr_specs(cs) for cs in batched.corr_markers),
    )


def _tile(x, C):
    return jnp.broadcast_to(x[None], (C,) + x.shape) if x is not None else None


def _map_chain_fields(state: ModelState, fn) -> ModelState:
    """Apply `fn` to every mutable (chain-dimension) leaf registered in
    _CHAIN_FIELDS, walking the ModelState containers once — the single
    place batch/squeeze/unsqueeze semantics live (a missed branch in a
    hand-copied walker only surfaces at shard_map trace time)."""
    import dataclasses

    def go(obj, cls):
        kw = {}
        for f in dataclasses.fields(cls):
            v = getattr(obj, f.name)
            kw[f.name] = fn(v) if (f.name in _CHAIN_FIELDS[cls] and v is not None) else v
        return cls(**kw)

    return ModelState(
        y=state.y,
        ycorr=fn(state.ycorr),
        e=go(state.e, ResidualState),
        fixed=tuple(go(fs, FixedState) for fs in state.fixed),
        random=tuple(go(rs, type(rs)) for rs in state.random),
        markers=tuple(go(ms, MarkerState) for ms in state.markers),
        sweep_index=fn(state.sweep_index),
        corr_markers=tuple(go(cs, CorrMarkerState) for cs in state.corr_markers),
    )


def batch_state(plan: SweepPlan, state: ModelState, n_chains: int) -> ModelState:
    """Add a leading chains dim to every mutable leaf."""
    return _map_chain_fields(state, lambda v: _tile(v, n_chains))


def _squeeze_chain(batched: ModelState, plan) -> ModelState:
    return _map_chain_fields(batched, lambda v: v[0])


def _unsqueeze_chain(state: ModelState, plan) -> ModelState:
    return _map_chain_fields(state, lambda v: v[None])


def _sweep_local(plan: SweepPlan, state: ModelState, chain_key, ctx: ShardCtx) -> ModelState:
    """One sweep on local (squeezed) state; marker stages use the shard ctx."""
    skey = rng.sweep_key(chain_key, state.sweep_index)
    ycorr = state.ycorr
    var_e = sample_var_e(
        rng.stage_key(skey, rng.STAGE_VAR_E), state.e, ycorr, plan.n, plan.e_df
    )
    fixed = []
    for i, (fs, fp) in enumerate(zip(state.fixed, plan.fixed)):
        b, ycorr = sample_fixed_block(
            rng.stage_key(skey, rng.STAGE_FIXED, i), fs, ycorr, var_e, fp.single
        )
        fixed.append(replace(fs, b=b))
    random = []
    for i, (rs, rp) in enumerate(zip(state.random, plan.random)):
        k = rng.stage_key(skey, rng.STAGE_RANDOM, i)
        if rp.correlated:
            u, var_u, ycorr = sample_random_corr(k, rs, ycorr, var_e, rp.df)
        elif rp.sampler == "cg":
            # ycorr is replicated across shards, so every shard runs the
            # identical CG iteration and the joint draw stays consistent
            u, var_u, ycorr = sample_random_cg(
                k, rs, ycorr, var_e, rp.df, rp, d_inv=state.e.d_inv
            )
        else:
            u, var_u, ycorr = sample_random_uni(k, rs, ycorr, var_e, rp.df)
        random.append(replace(rs, u=u, var_u=var_u))
    markers = []
    for i, (ms, mp) in enumerate(zip(state.markers, plan.markers)):
        k = rng.stage_key(skey, rng.STAGE_MARKER, i)
        ms, ycorr = sample_marker_set(k, ms, mp, ycorr, var_e, state.e.d_inv, ctx)
        markers.append(ms)
    corr_markers = []
    for i, (cs, cp) in enumerate(zip(state.corr_markers, plan.corr_markers)):
        k = rng.stage_key(skey, rng.STAGE_MARKER, len(plan.markers) + i)
        cs, ycorr = sample_corr_marker_set(k, cs, cp, ycorr, var_e, ctx)
        corr_markers.append(cs)
    return replace(
        state,
        ycorr=ycorr,
        e=replace(state.e, var_e=var_e),
        fixed=tuple(fixed),
        random=tuple(random),
        markers=tuple(markers),
        sweep_index=state.sweep_index + 1,
        corr_markers=tuple(corr_markers),
    )


def _check_shardable(plan: SweepPlan, n_shards: int) -> None:
    for cp in plan.corr_markers:
        if cp.vshards > 1:
            if cp.vshards % n_shards:
                raise ValueError(
                    f"correlated marker set {'+'.join(cp.names)}: vshards="
                    f"{cp.vshards} must be a multiple of n_shards={n_shards} "
                    f"— assemble with vshards = k * n_shards"
                )
        elif cp.n_blocks % n_shards:
            raise ValueError(
                f"correlated marker set {'+'.join(cp.names)}: n_blocks="
                f"{cp.n_blocks} is not divisible by n_shards={n_shards}; "
                f"pick a block size so nb % S == 0"
            )
    for mp in plan.markers:
        if mp.vshards > 1:
            if mp.vshards % n_shards:
                raise ValueError(
                    f"marker set {mp.name}: vshards={mp.vshards} must be a "
                    f"multiple of n_shards={n_shards} — assemble with "
                    f"vshards = k * n_shards"
                )
        elif mp.n_blocks % n_shards:
            raise ValueError(
                f"marker set {mp.name}: n_blocks={mp.n_blocks} is not "
                f"divisible by n_shards={n_shards}; pick a block size so "
                f"blocks split evenly across shards"
            )


def make_sharded_sweep(plan: SweepPlan, mesh: Mesh, n_sweeps: int = 1):
    """Build jitted f(batched_state, chain_keys) -> batched_state running
    `n_sweeps` sweeps on the mesh. chain_keys: (n_chains,) typed keys.

    Requires n_chains == mesh chains-axis size (one chain per device row).
    Marker sets assembled with vshards=V run the V-wide virtual-shard
    schedule split across the shard axis (V/S local chains per device); the
    resulting chain is identical to the single-device vshards=V chain.
    """
    n_shards = mesh.shape[SHARDS]
    _check_shardable(plan, n_shards)

    def fn(batched: ModelState, chain_keys):
        local = _squeeze_chain(batched, plan)
        key = chain_keys[0]
        ctx = ShardCtx(axis=SHARDS, index=jax.lax.axis_index(SHARDS), n_shards=n_shards)

        def body(st, _):
            return _sweep_local(plan, st, key, ctx), None

        local, _ = jax.lax.scan(body, local, None, length=n_sweeps)
        return _unsqueeze_chain(local, plan)

    def build(batched: ModelState):
        specs = state_specs(plan, batched)
        mapped = jax.shard_map(
            fn,
            mesh=mesh,
            in_specs=(specs, P(CHAINS)),
            out_specs=specs,
            check_vma=False,
        )
        return jax.jit(mapped)

    return build


def distribute(plan: SweepPlan, state: ModelState, mesh: Mesh, n_chains: int):
    """Batch the state over chains and lay it out on the mesh."""
    _check_shardable(plan, mesh.shape[SHARDS])
    batched = batch_state(plan, state, n_chains)
    specs = state_specs(plan, batched)
    out = jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)) if x is not None else None,
        batched,
        specs,
        is_leaf=lambda x: x is None,
    )
    return out
