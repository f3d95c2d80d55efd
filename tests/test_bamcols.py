"""Columnar BAM ingestion (io/bamcols.py) vs the ReadRecord object stream.

The columnar path must produce the bit-identical post-filter post-downsample
read stream (same rows, same order, same decoded payloads) and the identical
VCF/GVCF output, since it feeds the same downstream arithmetic.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

import simdata
from rovaca_tpu.io import bamcols
from rovaca_tpu.io.bam import BamReader
from rovaca_tpu.io.bai import build_index
from rovaca_tpu.reads.downsampler import PositionalDownsampler
from rovaca_tpu.reads.filters import HCReadFilter

pytestmark = pytest.mark.skipif(not bamcols.available(),
                                reason="native bamscan unavailable")


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("bamcols")
    rng = np.random.default_rng(77001)
    fa, bam, truth, ref = simdata.make_standard_case(
        d, rng=rng, coverage=60, length=6000)
    build_index(bam, bam + ".bai")
    return dict(dir=d, bam=bam, fa=fa, ref=ref)


def _object_stream(bam):
    filt, ds = HCReadFilter(), PositionalDownsampler()
    out = {}
    cur, bucket = None, []
    for r in BamReader(bam):
        if not filt.test(r):
            continue
        if r.contig != cur:
            if cur is not None and bucket:
                got = ds.stream_consume(bucket, at_eof=False)
                got.extend(ds.finalize())
                out[cur] = got
            cur, bucket = r.contig, []
        bucket.append(r)
    if cur is not None and bucket:
        out[cur] = ds.stream_consume(bucket, at_eof=True)
    return out


def _columnar_stream(bam):
    ds = bamcols.ColumnarDownsampler()
    out = {}
    pend = None
    for contig, cols in bamcols.stream_contig_columns(bam):
        rows = np.nonzero(cols.hc_filter_mask())[0]
        if rows.size == 0:
            continue
        if pend is not None:
            pc, pcols, prows = pend
            kept = ds.keep_indices(pcols.pos[prows], at_eof=False)
            out[pc] = pcols.select(prows[kept])
        pend = (contig, cols, rows)
    if pend is not None:
        pc, pcols, prows = pend
        kept = ds.keep_indices(pcols.pos[prows], at_eof=True)
        out[pc] = pcols.select(prows[kept])
    return out


def test_stream_equivalence(corpus):
    obj = _object_stream(corpus["bam"])
    col = _columnar_stream(corpus["bam"])
    assert set(obj) == set(col)
    for ctg in obj:
        o, c = obj[ctg], col[ctg]
        assert len(o) == c.n
        assert np.array_equal(
            np.fromiter((r.pos for r in o), np.int64, len(o)), c.pos)
        assert np.array_equal(
            np.fromiter((r.end for r in o), np.int64, len(o)), c.end)
        assert np.array_equal(
            np.fromiter((r.flag for r in o), np.int64, len(o)), c.flag)
        mats = c.materialize(np.arange(c.n))
        for r, m in zip(o, mats):
            assert (m.name, m.pos, m.flag, m.mapping_quality,
                    m.tlen, m.mate_pos, m.mate_ref_id) == \
                (r.name, r.pos, r.flag, r.mapping_quality,
                 r.tlen, r.mate_pos, r.mate_ref_id)
            assert m.bases == r.bases
            assert np.array_equal(m.quals, r.quals)
            assert m.cigar.elements == r.cigar.elements
            assert dict(m.tags.items()) == dict(r.tags.items())


def test_downsampler_lcg_equivalence(corpus):
    """Heavy pileups (above target depth) must draw the same LCG stream."""
    rng = np.random.default_rng(5150)
    # 300 reads on 3 positions -> reservoir kicks in hard
    pos = np.sort(rng.choice([100, 101, 250], size=300))
    ds_obj = PositionalDownsampler(target=50)

    class R:  # minimal read stand-in
        def __init__(self, p, i):
            self.ref_id, self.pos, self.i = 0, int(p), i
    reads = [R(p, i) for i, p in enumerate(pos)]
    kept_obj = [r.i for r in ds_obj.stream_consume(reads, at_eof=True)]

    ds_col = bamcols.ColumnarDownsampler(target=50)
    kept_col = ds_col.keep_indices(pos.astype(np.int64), at_eof=True)
    assert kept_obj == kept_col.tolist()


def _run_cli(corpus, out, gvcf, env_extra):
    env = dict(os.environ, JAX_PLATFORMS="cpu", **env_extra)
    cmd = [sys.executable, "-m", "rovaca_tpu.cli", "HaplotypeCaller",
           "-i", corpus["bam"], "-r", corpus["fa"], "-o", out]
    if gvcf:
        cmd += ["--erc", "GVCF"]
    subprocess.run(cmd, check=True, capture_output=True, env=env,
                   cwd=os.path.dirname(os.path.dirname(
                       os.path.abspath(__file__))))
    with open(out) as fh:
        return [ln for ln in fh if not ln.startswith("##")]


@pytest.mark.parametrize("gvcf", [False, True], ids=["vcf", "gvcf"])
def test_e2e_output_identical(corpus, gvcf, tmp_path):
    a = _run_cli(corpus, str(tmp_path / "cols.vcf"), gvcf, {})
    b = _run_cli(corpus, str(tmp_path / "objs.vcf"), gvcf,
                 {"ROVACA_NO_COLUMNS": "1"})
    assert a == b
