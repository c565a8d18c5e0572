"""Data-layer tests: pedigree/A-inverse, GRM, regions, ingestion."""
import numpy as np
import pytest

from nextgp_tpu.data import grm, ingest, pedigree, regions


def test_make_a_mrode_example():
    # Mrode (2005) example pedigree, the same construction makeA mirrors
    # (misc.jl:73-90): 6 animals, sires/dams 0-coded, 1-based labels.
    s = [0, 0, 1, 1, 4, 5]
    d = [0, 0, 2, 0, 3, 2]
    A = pedigree.make_a(s, d)
    assert A.shape == (6, 6)
    np.testing.assert_allclose(np.diag(A)[:4], [1, 1, 1, 1])
    np.testing.assert_allclose(A[4, 4], 1.125)  # parents 4 & 3 related
    np.testing.assert_allclose(A[0, 2], 0.5)


def test_a_inverse_vs_dense_inverse():
    s = [0, 0, 1, 1, 4, 5]
    d = [0, 0, 2, 0, 3, 2]
    ids = [str(i + 1) for i in range(6)]
    sir = [None, None, "1", "1", "4", "5"]
    dam = [None, None, "2", None, "3", "2"]
    ped = pedigree.build_pedigree(ids, sir, dam)
    idx = ped.index_of(ids)
    A = pedigree.make_a(s, d)
    ainv_h = pedigree.a_inverse(ped)
    # permute Henderson result into original id order
    P = np.zeros((6, 6))
    for i, j in enumerate(idx):
        P[j, i] = 1.0
    np.testing.assert_allclose(P.T @ ainv_h @ P, np.linalg.inv(A), atol=1e-10)


def test_inbreeding_full_sibs():
    # offspring of full sibs: F = 0.25
    ids = ["s", "d", "a", "b", "x"]
    sir = [None, None, "s", "s", "a"]
    dam = [None, None, "d", "d", "b"]
    ped = pedigree.build_pedigree(ids, sir, dam)
    f = dict(zip(ped.ids, ped.inbreeding))
    assert abs(f["x"] - 0.25) < 1e-12


def test_toposort_orders_parents_first():
    ped = pedigree.build_pedigree(["c", "a", "b"], ["a", None, "a"], ["b", None, None])
    pos = {v: i for i, v in enumerate(ped.ids)}
    assert pos["a"] < pos["c"] and pos["b"] < pos["c"]


def test_pedigree_loop_detected():
    with pytest.raises(ValueError, match="loop"):
        pedigree.build_pedigree(["a", "b"], ["b", "a"], [None, None])


def test_make_g_vanraden(rng):
    m = rng.integers(0, 3, size=(30, 100)).astype(float)
    g1 = grm.make_g(m, method=1)
    assert g1.shape == (30, 30)
    np.testing.assert_allclose(g1, g1.T)
    # trace of vanRaden G ~ n when markers in HWE
    assert 0.5 < np.trace(g1) / 30 < 1.5
    g2 = grm.make_g(m, method=2)
    assert np.all(np.linalg.eigvalsh(g2) > 0)


def test_regions_sentinels():
    info = regions.build_regions(10, 1)
    assert info.n_regions == 10
    info = regions.build_regions(10, 9999)
    assert info.n_regions == 1
    with pytest.raises(ValueError):
        regions.build_regions(10, 50)


def test_regions_from_map():
    chrs = np.r_[np.ones(10), np.full(7, 2)].astype(int)
    info = regions.build_regions(17, 99, chrs)
    assert info.n_regions == 2
    np.testing.assert_array_equal(info.sizes, [10, 7])
    info = regions.build_regions(17, 4, chrs)
    # ceil(10/4)=3 + ceil(7/4)=2
    assert info.n_regions == 5
    np.testing.assert_array_equal(info.sizes, [4, 4, 2, 4, 3])
    info = regions.build_regions(17, 9999, chrs)
    assert info.n_regions == 1


def test_ingest_drops_missing_and_centers(rng):
    m = rng.integers(0, 3, size=(20, 5)).astype(float)
    m[3, 2] = np.nan
    md = ingest.from_array(m, snp_ids=[f"s{i}" for i in range(5)])
    assert md.n_snp == 4
    assert md.snp_ids == ["s0", "s1", "s3", "s4"]
    c = md.centered()
    np.testing.assert_allclose(c.mean(axis=0), 0.0, atol=1e-12)


def test_ingest_genotype_file(tmp_path, rng):
    m = rng.integers(0, 3, size=(8, 6))
    path = tmp_path / "geno.txt"
    with open(path, "w") as fh:
        for row in m:
            fh.write(" ".join(str(v) for v in row) + "\n")
    md = ingest.read_genotype_file(str(path))
    assert md.genotypes.shape == (8, 6)
    np.testing.assert_array_equal(md.genotypes, m.astype(np.int8))


def test_device_array_assembly_matches_host(rng):
    """from_device_array + assemble produces the same chain as the host path."""
    import jax
    import jax.numpy as jnp

    import nextgp_tpu as ng
    from nextgp_tpu.data.ingest import from_device_array

    n, p = 50, 40
    g = rng.integers(0, 3, (n, p)).astype(np.int8)
    y = rng.normal(0, 1, n)
    prior = ng.BayesR([0.9, 0.05, 0.05], [0.0, 0.01, 0.1], 1.0)

    def build(md):
        spec = ng.ModelSpec(
            y=y,
            fixed=[ng.FixedTerm("int", np.ones(n))],
            markers=[ng.MarkerTerm("M", md, prior)],
            block_size=16,
        )
        return ng.assemble(spec)

    plan_h, st_h = build(ingest.from_array(g.astype(float)))
    plan_d, st_d = build(from_device_array(jnp.asarray(g)))
    np.testing.assert_allclose(
        np.asarray(st_h.markers[0].gram), np.asarray(st_d.markers[0].gram), atol=1e-9
    )
    key = jax.random.key(5)
    sweep_h = jax.jit(ng.make_sweep(plan_h))
    sweep_d = jax.jit(ng.make_sweep(plan_d))
    for _ in range(3):
        st_h = sweep_h(st_h, key)
        st_d = sweep_d(st_d, key)
    np.testing.assert_allclose(
        np.asarray(st_h.markers[0].beta), np.asarray(st_d.markers[0].beta), atol=1e-9
    )


def test_read_genotype_file_fractional_fallback(tmp_path):
    """Real-valued genotype files fall back to float storage (the reference
    stores centered f64 for any numeric file, prepMatVec.jl:129); columns
    with missing values still drop (prepMatVec.jl:118)."""
    path = tmp_path / "geno_frac.txt"
    path.write_text(
        "0.1 1 2.5 NA\n"
        "1.9 0 0.5 1\n"
        "0.7 2 1.5 2\n"
    )
    md = ingest.read_genotype_file(str(path))
    assert md.n_snp == 3 and md.n_ind == 3  # NA column dropped
    assert md.genotypes.dtype == np.float64  # reference stores f64 (prepMatVec.jl:129)
    np.testing.assert_allclose(md.center, [0.9, 1.0, 1.5], atol=1e-6)
    np.testing.assert_allclose(
        md.centered(), np.array([[0.1, 1, 2.5], [1.9, 0, 0.5], [0.7, 2, 1.5]])
        - np.array([0.9, 1.0, 1.5]), atol=1e-6)


def test_regions_interleaved_chromosomes():
    """Non-contiguous chromosome ids group by VALUE (unique(chrID) per
    misc.jl:170/179), not by runs — a run-dedup emitted ghost empty regions
    and overwrote first-pass assignments."""
    chrs = np.array([1, 1, 2, 2, 1, 1])
    info = regions.build_regions(6, 99, chrs)
    assert info.n_regions == 2
    np.testing.assert_array_equal(info.region_id, [0, 0, 1, 1, 0, 0])
    np.testing.assert_array_equal(info.sizes, [4, 2])
    info = regions.build_regions(6, 2, chrs)
    assert info.n_regions == 3
    np.testing.assert_array_equal(info.region_id, [0, 0, 2, 2, 1, 1])
    assert (info.sizes > 0).all()


def test_group_info_chromosome_labels(tmp_path):
    """r == 99 writes the ACTUAL chromosome id as groupID (misc.jl:170-173),
    so labels 3 and 7 pass through; window regions write 1-based ids."""
    chrs = np.array([3, 3, 7, 7])
    info = regions.build_regions(4, 99, chrs)
    fn = regions.write_group_info(str(tmp_path), "M", ["a", "b", "c", "d"], chrs, info, r=99)
    rows = [ln.split("\t") for ln in open(fn).read().strip().splitlines()[1:]]
    assert [r[3] for r in rows] == ["3", "3", "7", "7"]
    info2 = regions.build_regions(4, 2, chrs)
    fn2 = regions.write_group_info(str(tmp_path), "M2", ["a", "b", "c", "d"], chrs, info2, r=2)
    rows2 = [ln.split("\t") for ln in open(fn2).read().strip().splitlines()[1:]]
    assert [r[3] for r in rows2] == ["1", "1", "2", "2"]


def test_pedigree_duplicate_ids_rejected():
    with pytest.raises(ValueError, match="duplicate"):
        pedigree.build_pedigree(["a", "b", "a"], [None, None, None], [None, None, None])


def test_ess_multichain_variance():
    """ESS collapses for unmixed chains (between-chain variance folded in,
    Vehtari et al.) and is NaN, not a crash, for single-draw chains."""
    from nextgp_tpu.io.summary import ess_bulk

    r = np.random.default_rng(0)
    mixed = r.normal(0, 1, (4, 400, 1))
    assert ess_bulk(mixed)[0] > 1000
    stuck = r.normal(0, 1, (2, 400, 1))
    stuck[1] += 50.0
    assert ess_bulk(stuck)[0] < 10
    assert np.isnan(ess_bulk(np.zeros((2, 1, 3)))).all()
