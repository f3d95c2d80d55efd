"""Aux subsystems: checkpoint/resume, logging, refwindow."""

import numpy as np
import pytest

from rovaca_tpu.utils.checkpoint import ProgressCheckpoint, \
    truncate_output_after
from rovaca_tpu.utils.refwindow import RefWindow


class TestCheckpoint:
    def test_mark_and_reload(self, tmp_path):
        out = str(tmp_path / "o.vcf")
        ck = ProgressCheckpoint(out)
        assert ck.completed_through("chr1") == -1
        ck.mark_window("chr1", 0)
        ck.mark_window("chr1", 1 << 20)
        ck2 = ProgressCheckpoint(out)
        assert ck2.completed_through("chr1") == 1 << 20
        ck2.finish()
        assert ProgressCheckpoint(out).completed_through("chr1") == -1

    def test_truncate_output(self, tmp_path):
        out = tmp_path / "o.vcf"
        out.write_text("##header\n"
                       "#CHROM\tPOS\n"
                       "chr1\t100\tx\n"
                       "chr1\t2000000\tx\n"
                       "chr2\t5\tx\n")
        kept = truncate_output_after(str(out), "chr1", 1 << 20)
        lines = out.read_text().splitlines()
        assert kept == 2
        assert "chr1\t2000000\tx" not in lines
        assert "chr1\t100\tx" in lines
        assert "chr2\t5\tx" in lines


class TestRefWindow:
    def test_absolute_indexing(self):
        w = RefWindow(b"ACGTACGT", 100)
        assert w[100] == ord("A")
        assert w[103] == ord("T")
        assert w[102:106] == b"GTAC"
        assert 104 in w and 99 not in w

    def test_out_of_range_raises(self):
        w = RefWindow(b"ACGT", 100)
        with pytest.raises(IndexError):
            _ = w[99]
        with pytest.raises(IndexError):
            _ = w[50:102]

    def test_nested_of(self):
        w = RefWindow(b"ACGTACGTAC", 100)
        w2 = RefWindow.of(w, 102, 105)
        assert w2[102:106] == b"GTAC"
