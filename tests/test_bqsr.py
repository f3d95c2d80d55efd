"""BQSR: report parsing, covariate keys, empirical quality, apply."""

import numpy as np
import pytest

from rovaca_tpu.reads import bqsr
from rovaca_tpu.reads.record import ReadRecord

REPORT = """\
#:GATKReport.v1.1:5
#:GATKTable:2:2:%s:%s:;
#:GATKTable:Arguments:Recalibration argument collection values used in this run
Argument                    Value
binary_tag_name             null
covariate                   ReadGroupCovariate,QualityScoreCovariate,ContextCovariate,CycleCovariate
#:GATKTable:3:3:%d:%d:%d:;
#:GATKTable:Quantized:Quality quantization map
QualityScore  Count  QuantizedScore
25                10              25
30               100              30
35                50              35
#:GATKTable:6:1:%s:%s:%.4f:%.4f:%d:%.2f:;
#:GATKTable:RecalTable0:
ReadGroup  EventType  EmpiricalQuality  EstimatedQReported  Observations  Errors
rg1        M                   29.0000             30.0000        100000       120.00
#:GATKTable:6:2:%s:%d:%s:%.4f:%d:%.2f:;
#:GATKTable:RecalTable1:
ReadGroup  QualityScore  EventType  EmpiricalQuality  Observations  Errors
rg1                  30  M                   28.0000         90000        130.00
rg1                  25  M                   24.0000         10000         50.00
#:GATKTable:8:3:%s:%d:%s:%s:%s:%.4f:%d:%.2f:;
#:GATKTable:RecalTable2:
ReadGroup  QualityScore  CovariateValue  CovariateName  EventType  EmpiricalQuality  Observations  Errors
rg1                  30  AC              Context        M                   27.0000         20000         45.00
rg1                  30  1               Cycle          M                   29.0000          5000          6.00
rg1                  25  GG              Context        M                   20.0000          8000         80.00
"""


@pytest.fixture
def transformer(tmp_path):
    p = tmp_path / "recal.table"
    p.write_text(REPORT)
    return bqsr.BQSRReadTransformer.from_table(str(p))


def make_read(bases="ACGTACGTAC", quals=None, flag=0):
    quals = quals if quals is not None else [30] * len(bases)
    return ReadRecord(name="r", flag=flag, ref_id=0, pos=100,
                      mapping_quality=60, cigar=f"{len(bases)}M",
                      bases=bases, quals=quals, tags={"RG": "rg1"},
                      contig="chr1")


class TestParsing:
    def test_tables_loaded(self, transformer):
        t = transformer
        assert 0 in t.rg_table
        assert t.rg_table[0].estimated_qual == 30.0
        assert (0, 30) in t.qs_table
        assert (0, 25) in t.qs_table
        assert len(t.context_table) == 2
        assert len(t.cycle_table) == 1

    def test_quantized_identity_outside_map(self, transformer):
        assert transformer.quantized[50] == 50
        assert transformer.quantized[30] == 30


class TestKeys:
    def test_context_key_roundtrip(self):
        k_ac = bqsr.key_from_context(b"AC", 0, 2)
        k_gg = bqsr.key_from_context(b"GG", 0, 2)
        assert k_ac != k_gg
        assert k_ac & 0xF == 2  # length bits
        assert bqsr.key_from_context(b"AN", 0, 2) == -1

    def test_cycle_key(self):
        assert bqsr.key_from_cycle(1) == 2
        assert bqsr.key_from_cycle(-1) == 3
        assert bqsr.key_from_cycle(501) == -1


class TestEmpiricalQuality:
    def test_matches_reported_when_consistent(self):
        # 1e5 observations with errors exactly at Q30 rate -> Qemp 30
        q = bqsr.empirical_quality_bayesian_estimate(100000, 100, 30.0)
        assert q == 30.0

    def test_pulls_down_with_excess_errors(self):
        # 1% observed errors vs Q30 reported: likelihood pulls toward 20,
        # the tight Gaussian prior (sigma 0.5) resists — lands in between
        q = bqsr.empirical_quality_bayesian_estimate(100000, 1000, 30.0)
        assert 20.0 <= q <= 24.0

    def test_prior_dominates_few_observations(self):
        q = bqsr.empirical_quality_bayesian_estimate(10, 1, 30.0)
        assert 25.0 <= q <= 31.0


class TestApply:
    def test_recalibrates_quals(self, transformer):
        read = make_read()
        out = transformer.apply(read)
        assert out.quals.shape == read.quals.shape
        # RG delta: empirical(30k obs...) ~ 29-30 -> quals shift down a bit
        assert np.all(out.quals >= 1)
        assert np.any(out.quals != read.quals)

    def test_preserves_low_quals(self, transformer):
        read = make_read(quals=[2] * 10)
        out = transformer.apply(read)
        np.testing.assert_array_equal(out.quals, read.quals)

    def test_deterministic(self, transformer):
        a = transformer.apply(make_read()).quals
        b = transformer.apply(make_read()).quals
        np.testing.assert_array_equal(a, b)
