"""Native C++ runtime kernels vs their pure-Python equivalents."""
import os

import numpy as np
import pytest

from nextgp_tpu import native
from nextgp_tpu.data import ingest, pedigree

pytestmark = pytest.mark.skipif(not native.available(), reason="no native lib")


def _no_native_env(monkeypatch):
    monkeypatch.setenv("NEXTGP_NO_NATIVE", "1")
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_tried", False)


def test_parse_genotypes_matches_python(tmp_path, rng, monkeypatch):
    n, p = 37, 11
    g = rng.integers(0, 3, (n, p)).astype(float)
    g[3, 4] = np.nan  # column 4 must be dropped
    lines = []
    for row in g:
        lines.append(" ".join("NA" if np.isnan(v) else str(int(v)) for v in row))
    path = tmp_path / "geno.txt"
    path.write_text("\n".join(lines) + "\n")

    md_nat = ingest.read_genotype_file(str(path))
    _no_native_env(monkeypatch)
    md_py = ingest.read_genotype_file(str(path))

    assert md_nat.n_snp == md_py.n_snp == p - 1
    np.testing.assert_array_equal(md_nat.genotypes, md_py.genotypes)
    np.testing.assert_allclose(md_nat.center, md_py.center, atol=1e-12)


def test_parse_float_formatting(tmp_path):
    path = tmp_path / "g.txt"
    path.write_text("0.0 1.0 2.00\n2 1 0\n")
    md = ingest.read_genotype_file(str(path))
    np.testing.assert_array_equal(md.genotypes, [[0, 1, 2], [2, 1, 0]])


def _write_bed(path, codes_2bit, n, p):
    """codes_2bit: (p, n) int array of PLINK 2-bit codes."""
    bps = (n + 3) // 4
    body = np.zeros((p, bps), np.uint8)
    for j in range(p):
        for i in range(n):
            body[j, i // 4] |= codes_2bit[j, i] << (2 * (i % 4))
    with open(path, "wb") as fh:
        fh.write(bytes([0x6C, 0x1B, 0x01]))
        fh.write(body.tobytes())


def test_bed_read_matches_numpy(tmp_path, rng):
    n, p = 13, 7
    codes = rng.integers(0, 4, (p, n))
    bed = tmp_path / "x.bed"
    _write_bed(bed, codes, n, p)
    from nextgp_tpu.native import api as nat

    g_nat, cs_nat, cn_nat = nat.read_bed(str(bed), n, p)
    g_np, cs_np, cn_np = ingest._bed_decode_numpy(str(bed), n, p)
    np.testing.assert_array_equal(g_nat, g_np)
    np.testing.assert_allclose(cs_nat, cs_np)
    np.testing.assert_array_equal(cn_nat, cn_np)
    lut = {0: 2, 1: -1, 2: 1, 3: 0}
    for j in range(p):
        for i in range(n):
            assert g_nat[i, j] == lut[codes[j, i]]


def test_read_plink_full(tmp_path, rng):
    n, p = 9, 5
    codes = rng.integers(0, 4, (p, n))
    codes[:, 0] = 0  # individual 0 fully observed keeps no column all-missing
    _write_bed(tmp_path / "d.bed", codes, n, p)
    (tmp_path / "d.fam").write_text(
        "".join(f"F{i} I{i} 0 0 0 -9\n" for i in range(n)))
    (tmp_path / "d.bim").write_text(
        "".join(f"{1 + j % 2} snp{j} 0 {j} A C\n" for j in range(p)))
    md = ingest.read_plink(str(tmp_path / "d"))
    has_missing = (codes == 1).any(axis=1)
    assert md.n_snp == int((~has_missing).sum())
    assert md.sample_ids[0] == "I0"
    assert md.n_ind == n


def test_inbreeding_and_ainverse_match_python(rng, monkeypatch):
    # random valid pedigree: parents always earlier
    n = 120
    sire = np.full(n, -1, np.int64)
    dam = np.full(n, -1, np.int64)
    for i in range(10, n):
        sire[i] = rng.integers(0, i)
        dam[i] = rng.integers(0, i)
        if dam[i] == sire[i]:
            dam[i] = -1
    ped = pedigree.Pedigree(
        ids=list(range(n)), sire=sire, dam=dam,
        inbreeding=np.zeros(n),
    )
    from nextgp_tpu.native import api as nat

    f_nat = nat.inbreeding(sire, dam)
    _no_native_env(monkeypatch)
    f_py = pedigree.inbreeding_meuwissen_luo(sire, dam)
    np.testing.assert_allclose(f_nat, f_py, atol=1e-12)

    ped.inbreeding = f_py
    ainv_py = pedigree.a_inverse(ped)
    # A * A^-1 == I sanity via the tabular A on a small subset
    monkeypatch.delenv("NEXTGP_NO_NATIVE")
    monkeypatch.setattr(native, "_tried", False)
    assert native.available()
    ainv_nat = pedigree.a_inverse(ped)
    np.testing.assert_allclose(ainv_nat, ainv_py, atol=1e-12)

    ri, ci, v = pedigree.a_inverse_coo(ped)
    coo = np.zeros((n, n))
    coo[ri, ci] = v
    np.testing.assert_allclose(coo, ainv_py, atol=1e-12)


def test_write_tsv_block(tmp_path):
    from nextgp_tpu.native import api as nat

    path = tmp_path / "o.tsv"
    a = np.array([[1.5, 2.0, -3.25], [0.1, 0.2, 0.3]])
    nat.write_tsv_block(str(path), a)
    nat.write_tsv_block(str(path), np.array([9.0, 8.0, 7.0]))
    back = np.loadtxt(path)
    np.testing.assert_allclose(back, np.vstack([a, [9.0, 8.0, 7.0]]), rtol=1e-15)


def test_parse_rejects_fractional_and_extra_tokens(tmp_path):
    """Native and Python ingestion agree on error semantics: fractional
    dosages raise (not silently missing), rows with extra tokens are ragged
    (ADVICE r1)."""
    import pytest

    import nextgp_tpu.native as native
    from nextgp_tpu.native import api as nat

    if not native.available():
        pytest.skip("no native toolchain")

    frac = tmp_path / "frac.txt"
    frac.write_text("0 1 2\n0 1.5 2\n")
    with pytest.raises(ValueError, match="non-integral|invalid"):
        nat.parse_genotypes(str(frac))

    extra = tmp_path / "extra.txt"
    extra.write_text("0 1 2\n0 1 2 1\n")
    import numpy as np
    n, p = nat.geno_dims(str(extra))
    if (n, p) == (2, 3):
        with pytest.raises(ValueError, match="ragged"):
            nat.parse_genotypes(str(extra))

    ok = tmp_path / "ok.txt"
    ok.write_text("0 1 2.0 NA\n2 nan 1 .\n")
    g, s, c = nat.parse_genotypes(str(ok))
    np.testing.assert_array_equal(g, [[0, 1, 2, -1], [2, -1, 1, -1]])


def test_make_g_file_overload(tmp_path, rng):
    from nextgp_tpu.data.grm import make_g

    g = rng.integers(0, 3, (12, 20))
    path = tmp_path / "geno.txt"
    path.write_text("\n".join(" ".join(map(str, r)) for r in g) + "\n")
    import numpy as np
    np.testing.assert_allclose(make_g(str(path)), make_g(g), atol=1e-12)


def test_native_parser_out_of_range_tokens(tmp_path):
    """Out-of-int8 tokens must fall back (fail loudly as non-integral), not
    wrap: '256' previously parsed as dosage 0, '255' as missing, '254' hit
    the error path by colliding with the invalid marker."""
    from nextgp_tpu.data import ingest

    path = tmp_path / "g.txt"
    path.write_text("0 256 2\n1 130 0\n2 255 1\n")
    md = ingest.read_genotype_file(str(path))  # falls back to float storage
    assert md.genotypes.dtype == np.float64
    np.testing.assert_allclose(md.genotypes[:, 1], [256.0, 130.0, 255.0])
    path2 = tmp_path / "g2.txt"
    path2.write_text("0 -2 2\n1 0 0\n")  # negative non-missing: float too
    md2 = ingest.read_genotype_file(str(path2))
    np.testing.assert_allclose(md2.genotypes[:, 1], [-2.0, 0.0])


def test_native_parser_leading_blank_line(tmp_path):
    from nextgp_tpu.data import ingest

    path = tmp_path / "g.txt"
    path.write_text("\n0 1 2\n1 0 2\n")
    md = ingest.read_genotype_file(str(path))
    assert md.genotypes.shape == (2, 3)
    np.testing.assert_array_equal(md.genotypes, [[0, 1, 2], [1, 0, 2]])


def test_abi_fallback_reuses_existing_so2(monkeypatch, tmp_path):
    """On ABI mismatch at the hash-keyed path, lib() must LOAD an existing
    valid -abi<N>.so fallback instead of recompiling per process
    (ADVICE r4). Unit-level: CDLL/_bind/_compile are stubbed."""
    from types import SimpleNamespace

    import nextgp_tpu.native as nat

    so = str(tmp_path / "libfake.so")
    so2 = f"{so[:-3]}-abi{nat.ABI_VERSION}.so"
    for p in (so, so2):
        with open(p, "w") as fh:
            fh.write("x")
    stale = SimpleNamespace(ng_version=lambda: nat.ABI_VERSION - 1)
    good = SimpleNamespace(ng_version=lambda: nat.ABI_VERSION)
    compiles = []
    monkeypatch.setattr(nat, "_so_path", lambda: so)
    monkeypatch.setattr(nat, "_bind", lambda d: d)
    monkeypatch.setattr(nat, "_compile", lambda s: compiles.append(s) or True)
    monkeypatch.setattr(
        nat.ctypes, "CDLL", lambda path: good if path == so2 else stale)
    old_lib, old_tried = nat._lib, nat._tried
    nat._lib, nat._tried = None, False
    try:
        out = nat.lib()
        assert out is good
        assert compiles == []  # reused, not recompiled
    finally:
        nat._lib, nat._tried = old_lib, old_tried
