"""End-to-end: synthetic BAM -> CLI -> VCF with the expected calls."""

import numpy as np
import pytest

from rovaca_tpu.cli import main as cli_main

import simdata


def parse_vcf(path):
    records = []
    with open(path) as fh:
        for line in fh:
            if line.startswith("#"):
                continue
            f = line.rstrip("\n").split("\t")
            rec = {
                "contig": f[0], "pos": int(f[1]), "id": f[2], "ref": f[3],
                "alt": f[4].split(","), "qual": f[5], "info": f[7],
            }
            if len(f) > 9:
                rec["fmt"] = dict(zip(f[8].split(":"), f[9].split(":")))
            records.append(rec)
    return records


@pytest.fixture(scope="module")
def called_vcf(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("e2e")
    fasta, bam, truth, ref = simdata.make_standard_case(tmp)
    out = str(tmp / "out.vcf")
    rc = cli_main(["HaplotypeCaller", "-i", bam, "-r", fasta, "-o", out,
                   "--pairhmm-engine", "xla"])
    assert rc == 0
    return parse_vcf(out), truth, ref


class TestEndToEndVcf:
    def test_all_truth_variants_called(self, called_vcf):
        records, truth, ref = called_vcf
        by_pos = {r["pos"]: r for r in records}

        # het SNP at 0-based 600 -> VCF pos 601
        r = by_pos.get(601)
        assert r is not None, f"het SNP missing; calls at {sorted(by_pos)}"
        assert r["ref"] == truth["het_snp"][1]
        assert r["alt"] == [truth["het_snp"][2]]
        assert r["fmt"]["GT"] in ("0/1", "1/0")

        r = by_pos.get(1001)
        assert r is not None, "hom SNP missing"
        assert r["fmt"]["GT"] == "1/1"

        # the 3bp deletion may be emitted left-aligned (e.g. 1500 CACA>C
        # rather than 1501 ACAA>A) — same haplotype
        r = by_pos.get(1501) or by_pos.get(1500)
        assert r is not None, "het deletion missing"
        assert len(r["ref"]) == 4 and len(r["alt"][0]) == 1
        assert r["fmt"]["GT"] in ("0/1", "1/0")

        r = by_pos.get(2101)
        assert r is not None, "het insertion missing"
        assert len(r["ref"]) == 1 and len(r["alt"][0]) == 3
        assert r["fmt"]["GT"] in ("0/1", "1/0")

    def test_no_false_positives(self, called_vcf):
        records, truth, ref = called_vcf
        true_pos = {601, 1001, 1500, 1501, 2101}
        extra = [r for r in records if r["pos"] not in true_pos]
        assert len(extra) == 0, f"unexpected calls: {extra}"

    def test_record_fields_sane(self, called_vcf):
        records, _, _ = called_vcf
        for r in records:
            assert float(r["qual"]) > 30
            info = dict(kv.split("=", 1) for kv in r["info"].split(";")
                        if "=" in kv)
            assert "DP" in info and int(info["DP"]) > 10
            assert "MQ" in info
            assert "AC" in info
            fmt = r["fmt"]
            assert "PL" in fmt and "AD" in fmt and "GQ" in fmt
            pls = [int(x) for x in fmt["PL"].split(",")]
            assert min(pls) == 0
            ads = [int(x) for x in fmt["AD"].split(",")]
            assert sum(ads) > 10

    def test_sorted_output(self, called_vcf):
        records, _, _ = called_vcf
        positions = [r["pos"] for r in records]
        assert positions == sorted(positions)


class TestEndToEndGvcf:
    def test_gvcf_mode(self, tmp_path):
        import numpy as np
        rng = np.random.default_rng(7)
        fasta, bam, truth, ref = simdata.make_standard_case(tmp_path, rng,
                                                            coverage=16)
        out = str(tmp_path / "out.g.vcf")
        rc = cli_main(["HaplotypeCaller", "-i", bam, "-r", fasta, "-o", out,
                       "-e", "GVCF", "--pairhmm-engine", "xla"])
        assert rc == 0
        records = parse_vcf(out)
        assert records, "no gvcf records"
        # must contain NON_REF everywhere and real variant rows
        variant_rows = [r for r in records if r["alt"][0] != "<NON_REF>"]
        block_rows = [r for r in records if r["alt"] == ["<NON_REF>"]]
        assert variant_rows, "no variant rows in gvcf"
        assert block_rows, "no hom-ref blocks in gvcf"
        for r in variant_rows:
            assert r["alt"][-1] == "<NON_REF>"
        # hom-ref blocks have END and MIN_DP
        with_end = [r for r in block_rows if "END=" in r["info"]]
        assert with_end
        # coverage: blocks + variants should tile the read span contiguously
        positions = [r["pos"] for r in records]
        assert positions == sorted(positions)


class TestMultiContig:
    def test_two_contigs(self, tmp_path):
        import numpy as np
        from rovaca_tpu.io.bam import BamHeader, BamWriter
        from rovaca_tpu.io.fasta import write_fasta
        from rovaca_tpu.reads.record import ReadRecord

        rng = np.random.default_rng(31)
        refs = {c: simdata.random_ref(rng, 1200) for c in ("chrA", "chrB")}
        truth = {}
        reads = []
        for ci, (contig, ref) in enumerate(refs.items()):
            pos = 600
            alt = "ACGT"[("ACGT".index(ref[pos]) + 1) % 4]
            truth[contig] = (pos, ref[pos], alt)
            hap = ref[:pos] + alt + ref[pos + 1:]
            for i in range(12):
                s = int(rng.integers(480, 560))
                for src, tag in ((ref, "r"), (hap, "a")):
                    frag = src[s:s + 100]
                    reads.append(ReadRecord(
                        name=f"{contig}_{tag}{i}", flag=0, ref_id=ci, pos=s,
                        mapping_quality=60, cigar=f"{len(frag)}M",
                        bases=frag, quals=[35] * len(frag), contig=contig))
        fasta = str(tmp_path / "ref.fa")
        bam = str(tmp_path / "two.bam")
        write_fasta(fasta, refs)
        header = BamHeader(
            "@HD\tVN:1.6\tSO:coordinate\n"
            + "".join(f"@SQ\tSN:{c}\tLN:1200\n" for c in refs)
            + "@RG\tID:rg1\tSM:S1\n", list(refs), [1200, 1200])
        reads.sort(key=lambda r: (r.ref_id, r.pos))
        with BamWriter(bam, header) as w:
            for r in reads:
                w.write(r)
        out = str(tmp_path / "out.vcf")
        rc = cli_main(["HaplotypeCaller", "-i", bam, "-r", fasta, "-o", out,
                       "--pairhmm-engine", "xla"])
        assert rc == 0
        records = parse_vcf(out)
        by_contig = {}
        for r in records:
            by_contig.setdefault(r["contig"], []).append(r)
        assert set(by_contig) == {"chrA", "chrB"}
        for contig, (pos, ref_b, alt_b) in truth.items():
            assert any(r["pos"] == pos + 1 and r["alt"] == [alt_b]
                       for r in by_contig[contig]), contig


class TestSpanningDeletionFixup:
    def test_gvcf_no_homref_under_deletion(self, tmp_path):
        """Hom-ref GVCF rows never start inside a deletion's span — the
        emission-side counterpart of the reference's writer fixup
        (writer.cpp:218-335 check_deletion_variant)."""
        rng = np.random.default_rng(11)
        fasta, bam, truth, ref = simdata.make_standard_case(tmp_path, rng,
                                                            coverage=20)
        out = str(tmp_path / "out.g.vcf")
        rc = cli_main(["HaplotypeCaller", "-i", bam, "-r", fasta, "-o", out,
                       "-e", "GVCF", "--pairhmm-engine", "xla"])
        assert rc == 0
        records = parse_vcf(out)
        horizon = 0
        for r in records:
            is_variant = r["alt"][0] != "<NON_REF>"
            if is_variant:
                if len(r["ref"]) > 1:
                    horizon = max(horizon, r["pos"] + len(r["ref"]))
            else:
                assert r["pos"] >= horizon, \
                    f"hom-ref row at {r['pos']} under deletion (next " \
                    f"available {horizon})"


class TestResumeBgzf:
    def test_resume_mid_contig_vcf_gz(self, tmp_path):
        """--resume on a .vcf.gz output: the truncated file stays valid
        BGZF, appended records continue it, and the final file matches a
        straight-through run."""
        import gzip
        import json
        import os

        rng = np.random.default_rng(13)
        fasta, bam, truth, ref = simdata.make_standard_case(tmp_path, rng)

        full = str(tmp_path / "full.vcf.gz")
        rc = cli_main(["HaplotypeCaller", "-i", bam, "-r", fasta, "-o", full,
                       "--pairhmm-engine", "xla"])
        assert rc == 0
        want = gzip.open(full, "rt").read()

        # simulate an interrupted run: copy the full output, then force the
        # checkpoint to claim only the first window finished
        part = str(tmp_path / "part.vcf.gz")
        with open(full, "rb") as src, open(part, "wb") as dst:
            dst.write(src.read())
        state = {"contigs": {"chr20": -(1 << 20)}}  # window start before 0
        with open(part + ".progress", "w") as fh:
            json.dump(state, fh)

        rc = cli_main(["HaplotypeCaller", "-i", bam, "-r", fasta, "-o", part,
                       "--pairhmm-engine", "xla", "--resume"])
        assert rc == 0
        got = gzip.open(part, "rt").read()
        # bodies identical (header may repeat command line); compare records
        want_body = [ln for ln in want.splitlines() if not
                     ln.startswith("#")]
        got_body = [ln for ln in got.splitlines() if not ln.startswith("#")]
        assert got_body == want_body
        # output is true BGZF ending with the EOF marker
        from rovaca_tpu.io.bgzf import EOF_BLOCK
        raw = open(part, "rb").read()
        assert raw.endswith(EOF_BLOCK)
        if os.path.exists(part + ".progress"):
            os.unlink(part + ".progress")
