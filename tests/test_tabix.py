"""Tabix index: build/load/query parity with brute-force line scan."""

import numpy as np
import pytest

from rovaca_tpu.io import bgzf, tabix
from rovaca_tpu.io.vcf import VcfReader


@pytest.fixture(scope="module")
def indexed_vcf(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("tbx")
    lines = ["##fileformat=VCFv4.2",
             "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO"]
    rng = np.random.default_rng(2)
    poss = sorted(rng.choice(2_000_000, size=5000, replace=False))
    for i, p in enumerate(poss):
        lines.append(f"chr1\t{p + 1}\trs{i}\tA\tG\t50\t.\t.")
    for j in range(50):
        lines.append(f"chr2\t{j * 1000 + 1}\trsB{j}\tCT\tC\t50\t.\t.")
    path = str(tmp / "t.vcf.gz")
    with bgzf.Writer(path) as w:
        w.write(("\n".join(lines) + "\n").encode())
    tabix.build_index(path)
    return path, lines, poss


def _brute(lines, contig, beg, end):
    out = []
    for ln in lines[2:]:
        f = ln.split("\t")
        if f[0] != contig:
            continue
        p0 = int(f[1]) - 1
        if p0 < end and p0 + len(f[3]) > beg:
            out.append(ln)
    return out


class TestTabix:
    def test_load_names(self, indexed_vcf):
        path, _, _ = indexed_vcf
        idx = tabix.TabixIndex.load(path + ".tbi")
        assert idx.names == ["chr1", "chr2"]

    def test_queries_match_brute_force(self, indexed_vcf):
        path, lines, _ = indexed_vcf
        idx = tabix.TabixIndex.load(path + ".tbi")
        for contig, beg, end in [("chr1", 500_000, 600_000), ("chr1", 0, 10),
                                 ("chr2", 0, 100_000), ("chr2", 30_000, 30_001),
                                 ("chr3", 0, 100)]:
            got = list(tabix.fetch_lines(path, idx, contig, beg, end))
            assert got == _brute(lines, contig, beg, end)

    def test_unsorted_rejected(self, tmp_path):
        path = str(tmp_path / "bad.vcf.gz")
        with bgzf.Writer(path) as w:
            w.write(b"chr1\t100\t.\tA\tG\t.\t.\t.\n"
                    b"chr1\t50\t.\tA\tG\t.\t.\t.\n")
        with pytest.raises(ValueError):
            tabix.build_index(path)

    def test_vcfreader_uses_index(self, indexed_vcf):
        path, _, poss = indexed_vcf
        rd = VcfReader(path)
        assert rd._tbi is not None
        assert rd.lookup_id("chr1", poss[42], b"A", [b"G"]) == "rs42"
        # shared-event matching: same pos but different ref or alt -> None
        assert rd.lookup_id("chr1", poss[42], b"T", [b"G"]) is None
        assert rd.lookup_id("chr1", poss[42], b"A", [b"C"]) is None
        assert rd.lookup_id("chr2", 3000, b"CT", [b"C"]) == "rsB3"

    def test_vcfreader_eager_without_index(self, indexed_vcf, tmp_path):
        path, lines, poss = indexed_vcf
        import gzip as _gz
        plain = str(tmp_path / "p.vcf")
        with open(plain, "w") as fh, _gz.open(path, "rt") as src:
            fh.write(src.read())
        rd = VcfReader(plain)
        assert rd._tbi is None
        assert rd.lookup_id("chr1", poss[42], b"A", [b"G"]) == "rs42"
