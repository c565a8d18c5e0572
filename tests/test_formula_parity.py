"""Formula front-end parity with the reference's worked examples:
PBLUP-style PED(ID) + PED(Dam) + (1|Dam) with fixed-effect blocking
(docs/src/PBLUP/PBLUP.md), user-matrix random structures, and tuple-key
correlated random groups (mme.jl:207-239)."""
import numpy as np
import pytest

import nextgp_tpu as ng
from nextgp_tpu.api.formula import parse_formula


@pytest.fixture
def pblup_setup(tmp_path, rng):
    n_ped = 40
    sire = ["0"] * n_ped
    dam = ["0"] * n_ped
    for i in range(10, n_ped):
        s, d = rng.integers(0, i, 2)
        if s != d:
            sire[i], dam[i] = f"A{s + 1}", f"A{d + 1}"
    ped_path = tmp_path / "ped.txt"
    ped_path.write_text("".join(f"A{i + 1} {sire[i]} {dam[i]}\n" for i in range(n_ped)))
    n = 25
    idx = rng.choice(np.arange(10, n_ped), n, replace=False)
    data = {
        "BW": rng.normal(10, 2, n),
        "ID": np.array([f"A{i + 1}" for i in idx]),
        "Dam": np.array([dam[i] if dam[i] != "0" else "A1" for i in idx]),
        "Herds": rng.integers(0, 3, n),
        "Pen": rng.integers(0, 2, n),
    }
    return str(ped_path), data


def test_pblup_formula(pblup_setup):
    ped_path, data = pblup_setup
    spec = parse_formula(
        "BW ~ Herds + Pen + PED(ID) + PED(Dam) + (1|Dam)",
        data,
        priors={
            "ID": ng.Random("A", 150.0),
            "Dam": ng.Random("A", 90.0),
            "1|Dam": ng.Random("I", 40.0),
            "e": ng.Random("I", 350.0),
        },
        path2ped=ped_path,
        blocks=[("Herds", "Pen")],
    )
    names = [t.name for t in spec.random]
    assert names == ["ID", "Dam", "Dam"]
    labels = [t.structure_label for t in spec.random]
    assert labels == ["A", "A", "I"]
    assert spec.blocks == [("Herds", "Pen")]
    plan, state = ng.assemble(spec)
    assert plan.fixed[0].k >= 2  # blocked Herds+Pen
    assert [rp.q for rp in plan.random][:2] == [40, 40]  # pedigree levels
    # model card pairs spec terms positionally: both "Dam" rows (PED(Dam)
    # structure A, (1|Dam) structure I) must keep their own labels, and the
    # resolved scales match the reference's analysis table rule
    # v*(df-2)/df (mme.jl:269-271,537-538)
    card = ng.model_card(spec, plan, state)
    dam_rows = [ln for ln in card.splitlines() if ln.strip().startswith("random: Dam")]
    assert len(dam_rows) == 2
    assert "structure A" in dam_rows[0] and "scale 45" in dam_rows[0]
    assert "structure I" in dam_rows[1] and "scale 20" in dam_rows[1]


def test_correlated_tuple_prior(pblup_setup):
    ped_path, data = pblup_setup
    v = np.array([[150.0, 30.0], [30.0, 90.0]])
    spec = parse_formula(
        "BW ~ Herds + PED(ID) + PED(Dam)",
        data,
        priors={("ID", "Dam"): ng.Random("A", v)},
        path2ped=ped_path,
    )
    assert len(spec.random) == 1
    t = spec.random[0]
    assert t.correlated and t.name == ("ID", "Dam")
    plan, state = ng.assemble(spec)
    assert plan.random[0].correlated and plan.random[0].n_t == 2
    import jax

    sweep = jax.jit(ng.make_sweep(plan))
    st = sweep(state, jax.random.key(0))
    assert np.isfinite(np.asarray(st.ycorr)).all()
    assert np.asarray(st.random[0].var_u).shape == (2, 2)


def test_user_matrix_structure(rng):
    n, q = 30, 5
    grp = np.arange(1, q + 1).repeat(n // q)  # every level present (0 = missing)
    a = rng.normal(0, 1, (q, q))
    user = a @ a.T + q * np.eye(q)
    data = {"y": rng.normal(0, 1, n), "grp": grp}
    spec = parse_formula(
        "y ~ 1 + (1|grp)", data, priors={"grp": ng.Random(user, 1.0)}
    )
    t = spec.random[0]
    assert t.structure_label == "user"
    np.testing.assert_allclose(t.ivstr, np.linalg.inv(user), atol=1e-10)
    plan, state = ng.assemble(spec)
    import jax

    st = jax.jit(ng.make_sweep(plan))(state, jax.random.key(1))
    assert np.isfinite(np.asarray(st.random[0].u)).all()


def test_correlated_prior_unknown_term(rng):
    data = {"y": rng.normal(0, 1, 10), "g": rng.integers(0, 2, 10)}
    with pytest.raises(ValueError, match="unknown random terms"):
        parse_formula(
            "y ~ 1 + (1|g)", data,
            priors={("g", "h"): ng.Random("I", np.eye(2))},
        )


def test_snp_map_kwarg_with_dict_genotypes(rng, tmp_path):
    """SNP(name, map=...) with genotypes supplied via the dict must attach
    the map (the optional source group used to swallow the map= argument
    and drop it silently)."""
    from nextgp_tpu.api.formula import parse_formula

    n, p = 30, 8
    g = rng.integers(0, 3, (n, p)).astype(float)
    mapf = tmp_path / "chip.map"
    with open(mapf, "w") as fh:
        fh.write("snpID,snpOrder,chrID\n")
        for i in range(p):
            fh.write(f"s{i},{i + 1},{1 if i < 5 else 2}\n")
    spec = parse_formula(
        f"y ~ 1 + SNP(geno, map={mapf})",
        {"y": rng.normal(0, 1, n)},
        priors={"geno": ng.BayesPR(99, 0.05)},
        genotypes={"geno": g},
        block_size=8,
    )
    md = spec.markers[0].data
    assert md.chr_ids is not None and list(md.snp_ids)[:2] == ["s0", "s1"]
    plan, _ = ng.assemble(spec)
    assert plan.markers[0].n_regions == 2  # per-chromosome regions resolved


def test_packed_genotypes_reject_pedigree_reorder(rng, tmp_path):
    """Pedigree row reordering on a 2-bit packed panel would permute SNP
    rows, not individuals — must error, not corrupt."""
    from nextgp_tpu.api.formula import parse_formula
    from nextgp_tpu.ops import pack2

    n, p = 6, 8
    g = rng.integers(0, 3, (n, p)).astype(np.int8)
    md = ng.from_packed(pack2.pack2_np(g), n_ind=n, center=g.astype(float).mean(0))
    ped = tmp_path / "ped.txt"
    ids = [f"A{i}" for i in range(n)]
    with open(ped, "w") as fh:
        fh.write("id,sire,dam\n")
        for i in reversed(range(n)):  # reversed: forces a re-sort
            fh.write(f"A{i},0,0\n")
    data = {"y": rng.normal(0, 1, n), "ID": np.array(ids)}
    with pytest.raises(ValueError, match="packed"):
        parse_formula(
            "y ~ 1 + PED(ID) + SNP(geno)", data,
            priors={"ID": ng.Random("A", 0.5), "geno": ng.BayesPR(9999, 0.05)},
            path2ped=str(ped), genotypes={"geno": md}, block_size=8,
        )


def test_snp_positional_path_containing_equals(rng, tmp_path):
    """A positional genotype path containing '=' (e.g. data/run=2/geno.txt)
    must keep parsing as a path — only bare-identifier prefixes count as
    keyword arguments (ADVICE r4)."""
    from nextgp_tpu.api.formula import parse_formula

    n, p = 20, 6
    g = rng.integers(0, 3, (n, p))
    d = tmp_path / "run=2"
    d.mkdir()
    gf = d / "geno.txt"
    with open(gf, "w") as fh:
        for row in g:
            fh.write(" ".join(map(str, row)) + "\n")
    spec = parse_formula(
        f"y ~ 1 + SNP(M, {gf})",
        {"y": rng.normal(0, 1, n)},
        priors={"M": ng.BayesPR(9999, 0.05)},
        block_size=8,
    )
    assert spec.markers[0].data.n_snp == p
    # a bare-identifier keyword that isn't map= still errors
    with pytest.raises(ValueError, match="unrecognized SNP"):
        parse_formula(
            "y ~ 1 + SNP(M, chip=foo)",
            {"y": rng.normal(0, 1, n)},
            priors={"M": ng.BayesPR(9999, 0.05)},
            genotypes={"M": g.astype(float)},
            block_size=8,
        )
