"""Exact-resume test (SURVEY.md §5 checkpoint/resume row)."""
import numpy as np
import jax

import nextgp_tpu as ng
from nextgp_tpu.io.checkpoint import load_checkpoint, save_checkpoint


def test_exact_resume(rng, tmp_path):
    n, p = 60, 32
    g = rng.integers(0, 3, (n, p)).astype(float)
    y = (g - g.mean(0)) @ rng.normal(0, 0.2, p) + rng.normal(0, 1, n)
    spec = ng.ModelSpec(
        y=y,
        fixed=[ng.FixedTerm("int", np.ones(n))],
        markers=[ng.MarkerTerm("M1", ng.from_array(g),
                 ng.BayesR([0.8, 0.1, 0.1], [0.0, 1e-3, 1e-2], 1.0, estimatePi=True))],
        block_size=16,
    )
    plan, state = ng.assemble(spec)
    sweep = jax.jit(ng.make_sweep(plan))
    key = jax.random.key(4)

    s = state
    for _ in range(5):
        s = sweep(s, key)
    ckpt = str(tmp_path / "chain.npz")
    save_checkpoint(ckpt, s)
    for _ in range(5):
        s = sweep(s, key)

    # resume from sweep 5 and continue — must reproduce sweep 10 exactly
    s2 = load_checkpoint(ckpt, state)
    assert int(s2.sweep_index) == 5
    for _ in range(5):
        s2 = sweep(s2, key)
    assert jax.numpy.array_equal(s.markers[0].beta, s2.markers[0].beta)
    assert jax.numpy.array_equal(s.ycorr, s2.ycorr)
    assert jax.numpy.array_equal(s.markers[0].delta, s2.markers[0].delta)
    assert float(s.e.var_e) == float(s2.e.var_e)


def test_checkpoint_shape_guard(rng, tmp_path):
    n, p = 40, 16
    g = rng.integers(0, 3, (n, p)).astype(float)
    y = rng.normal(0, 1, n)
    spec = ng.ModelSpec(y=y, markers=[ng.MarkerTerm("M1", ng.from_array(g), None)], block_size=8)
    plan, state = ng.assemble(spec)
    ckpt = str(tmp_path / "c.npz")
    save_checkpoint(ckpt, state)
    spec2 = ng.ModelSpec(y=y[:20], markers=[ng.MarkerTerm("M1", ng.from_array(g[:20]), None)], block_size=8)
    _, state2 = ng.assemble(spec2)
    import pytest

    with pytest.raises(ValueError):
        load_checkpoint(ckpt, state2)


def test_run_lmem_resume_exact(tmp_path, rng):
    """Interrupted run + resume produces the identical chain and files as an
    uninterrupted run (counter-based keys re-derive everything)."""
    import nextgp_tpu as ng

    n, p = 40, 32
    g = rng.integers(0, 3, (n, p)).astype(float)
    y = rng.normal(0, 1, n)

    def spec():
        return ng.ModelSpec(
            y=y,
            fixed=[ng.FixedTerm("int", np.ones(n))],
            markers=[ng.MarkerTerm("M", ng.from_array(g), ng.BayesC(0.2, 0.05))],
            block_size=16,
        )

    kw = dict(n_chain=80, n_burn=20, n_thin=10, seed=3, keep_in_memory=True)
    full = ng.run_lmem(spec(), out_folder=str(tmp_path / "a"), **kw)

    # interrupted: checkpoint every kept sample, stop after 3 kept
    out_b = str(tmp_path / "b")
    partial = ng.run_lmem(
        spec(), out_folder=out_b, checkpoint_every=1,
        **{**kw, "n_chain": 50},
    )
    assert (tmp_path / "b" / "chain.ckpt").exists()
    resumed = ng.run_lmem(
        spec(), out_folder=out_b, checkpoint_every=1, resume=True, **kw
    )
    a = np.loadtxt(tmp_path / "a" / "betaMOut", skiprows=1)
    b = np.loadtxt(tmp_path / "b" / "betaMOut", skiprows=1)
    np.testing.assert_allclose(a, b, atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(full.state.ycorr), np.asarray(resumed.state.ycorr), atol=1e-12
    )


def test_writer_failed_block_not_retried(tmp_path, monkeypatch):
    """A failed block write must neither re-append already-written rows on
    the next attempt (double-weighted draws) nor drop sibling quantities of
    the same sample; the error surfaces at close()."""
    import numpy as np
    import pytest

    from nextgp_tpu.io import writer as W

    w = W.MCMCWriter(str(tmp_path), headers={"a": ["a1"], "b": ["b1"]},
                     block_rows=2)
    orig = w._write_block
    fails = {"n": 0}

    def flaky(name, rows):
        if name == "a" and fails["n"] == 0:
            fails["n"] += 1
            raise OSError("disk full")
        return orig(name, rows)

    w._write_block = flaky
    for i in range(6):
        w.put({"a": np.array([float(i)]), "b": np.array([10.0 + i])})
    with pytest.raises(OSError):
        w.close()

    # quantity b: all six rows landed exactly once
    b = np.loadtxt(tmp_path / "bOut", skiprows=1)
    np.testing.assert_allclose(b, 10.0 + np.arange(6.0))
    # quantity a: the failed block (rows 0,1) is lost, NOT duplicated
    a = np.atleast_1d(np.loadtxt(tmp_path / "aOut", skiprows=1))
    assert a.tolist() == [2.0, 3.0, 4.0, 5.0]


def test_writer_flush_after_close_is_noop(tmp_path):
    import numpy as np

    from nextgp_tpu.io import writer as W

    w = W.MCMCWriter(str(tmp_path), headers={"a": ["a1"]})
    w.put({"a": np.array([1.0])})
    w.close()
    w.flush()  # previously deadlocked forever
    w.close()  # idempotent
