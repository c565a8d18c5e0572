"""The jitted Gibbs sweep: one full pass over all effect families.

Stage order matches `runSampler!` (`/root/reference/src/samplers.jl:29-53`):
residual variance -> fixed-effect blocks -> random effects (+variances) ->
marker sets. The whole sweep is a single traced program; `run_chain` scans
it with thinned outputs so an entire thinning interval executes on-device
without host round-trips (replacing the synchronous per-iteration TSV writes
of samplers.jl:56-104 with device-side sample stacking).
"""
from __future__ import annotations

from functools import partial
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax import lax

from ..utils import replace
from . import rng
from .plan import SweepPlan
from .samplers.fixed import sample_fixed_block
from .samplers.markers import sample_corr_marker_set, sample_marker_set
from .samplers.random_effects import (
    sample_random_cg,
    sample_random_corr,
    sample_random_uni,
)
from .samplers.residual import sample_var_e
from .state import ModelState


def make_sweep(plan: SweepPlan):
    """Build sweep(state, chain_key) -> state closed over the static plan."""

    def sweep(state: ModelState, chain_key) -> ModelState:
        skey = rng.sweep_key(chain_key, state.sweep_index)
        ycorr = state.ycorr

        with jax.named_scope("gibbs.var_e"):
            var_e = sample_var_e(
                rng.stage_key(skey, rng.STAGE_VAR_E), state.e, ycorr, plan.n, plan.e_df
            )

        fixed = []
        for i, (fs, fp) in enumerate(zip(state.fixed, plan.fixed)):
            with jax.named_scope(f"gibbs.fixed.{i}"):
                b, ycorr = sample_fixed_block(
                    rng.stage_key(skey, rng.STAGE_FIXED, i), fs, ycorr, var_e, fp.single
                )
            fixed.append(replace(fs, b=b))

        random = []
        for i, (rs, rp) in enumerate(zip(state.random, plan.random)):
            k = rng.stage_key(skey, rng.STAGE_RANDOM, i)
            with jax.named_scope(f"gibbs.random.{i}"):
                if rp.correlated:
                    u, var_u, ycorr = sample_random_corr(k, rs, ycorr, var_e, rp.df)
                elif rp.sampler == "cg":
                    u, var_u, ycorr = sample_random_cg(
                        k, rs, ycorr, var_e, rp.df, rp, d_inv=state.e.d_inv
                    )
                else:
                    u, var_u, ycorr = sample_random_uni(k, rs, ycorr, var_e, rp.df)
            random.append(replace(rs, u=u, var_u=var_u))

        markers = []
        for i, (ms, mp) in enumerate(zip(state.markers, plan.markers)):
            k = rng.stage_key(skey, rng.STAGE_MARKER, i)
            with jax.named_scope(f"gibbs.marker.{mp.name}"):
                ms, ycorr = sample_marker_set(k, ms, mp, ycorr, var_e, state.e.d_inv)
            markers.append(ms)

        corr_markers = []
        for i, (cs, cp) in enumerate(zip(state.corr_markers, plan.corr_markers)):
            k = rng.stage_key(skey, rng.STAGE_MARKER, len(plan.markers) + i)
            with jax.named_scope("gibbs.corr_marker"):
                cs, ycorr = sample_corr_marker_set(k, cs, cp, ycorr, var_e)
            corr_markers.append(cs)

        return replace(
            state,
            ycorr=ycorr,
            e=replace(state.e, var_e=var_e),
            fixed=tuple(fixed),
            random=tuple(random),
            markers=tuple(markers),
            corr_markers=tuple(corr_markers),
            sweep_index=state.sweep_index + 1,
        )

    return sweep


def collect_sample(state: ModelState, plan: SweepPlan) -> Dict[str, Any]:
    """The tracked quantities the reference streams per kept iteration
    (samplers.jl:56-104): b, varE, u/varU per random set, beta/delta/var
    per marker set, plus method-specific extras (pi, annot, c, varZeta)."""
    out: Dict[str, Any] = {"varE": state.e.var_e}
    for fs, fp in zip(state.fixed, plan.fixed):
        out.setdefault("b", []).append(fs.b)
    if state.fixed:
        out["b"] = jnp.concatenate(out["b"])
    for rs, rp in zip(state.random, plan.random):
        nm = rp.name if isinstance(rp.name, str) else "_".join(rp.name)
        out[f"u{nm}"] = rs.u
        out[f"varU{nm}"] = rs.var_u
    for ms, mp in zip(state.markers, plan.markers):
        out[f"beta{mp.name}"] = ms.beta[: mp.p]
        out[f"delta{mp.name}"] = ms.delta[: mp.p]
        out[f"var{mp.name}"] = ms.var_beta[: mp.p] if mp.n_var == mp.p_pad else ms.var_beta
        if mp.method in ("BayesB", "BayesC", "BayesR"):
            out[f"pi{mp.name}"] = ms.pi_hat
        if mp.method in ("BayesRCpi", "BayesRCplus"):
            out[f"pi{mp.name}"] = ms.pi_hat.reshape(-1)
            out[f"annot{mp.name}"] = ms.annot_cat[: mp.p]
        if mp.method == "BayesLV":
            out[f"c{mp.name}"] = ms.lv_c
            out[f"varZeta{mp.name}"] = ms.var_zeta
    for cs, cp in zip(state.corr_markers, plan.corr_markers):
        for t, nm in enumerate(cp.names):
            out[f"beta{nm}"] = cs.beta[: cp.p, t]
        out[f"var{'_'.join(cp.names)}"] = cs.var_beta.reshape(cp.n_regions, -1)
    return out


def make_chain_runner(plan: SweepPlan, thin: int):
    """jitted runner: advance `thin` sweeps, return (state, thinned sample)."""
    sweep = make_sweep(plan)

    @partial(jax.jit, donate_argnums=0)
    def run_thin(state, chain_key):
        def body(st, _):
            return sweep(st, chain_key), None

        state, _ = lax.scan(body, state, None, length=thin)
        return state, collect_sample(state, plan)

    return run_thin


def make_scan_sampler(plan: SweepPlan, n_keep: int, thin: int):
    """Whole-chain-on-device runner: returns stacked thinned draws.

    Used by benchmarks and the sharded path where host spooling per interval
    would serialize the device.
    """
    sweep = make_sweep(plan)

    @partial(jax.jit, static_argnums=())
    def run(state, chain_key):
        def outer(st, _):
            def inner(s, _):
                return sweep(s, chain_key), None

            st, _ = lax.scan(inner, st, None, length=thin)
            return st, collect_sample(st, plan)

        state, draws = lax.scan(outer, state, None, length=n_keep)
        return state, draws

    return run
