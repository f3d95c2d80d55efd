"""The packed GVCF inactive-region path (finalize arrays -> position-obs,
no ReadRecord round-trip) must produce records identical to the record
path on randomized regions."""

import numpy as np
import pytest

from rovaca_tpu.native import finalize_native, posobs_native

pytestmark = pytest.mark.skipif(
    not (finalize_native.available() and posobs_native.available()),
    reason="native toolchain unavailable")


def _region(rng, n_frags=60):
    import simdata
    from rovaca_tpu.assembly import assembler
    ref = simdata.random_ref(rng, 900)
    reads = simdata.simulate_fragments(rng, ref, ref, "chr1", 25,
                                       name_prefix="pk_")
    return ref, list(reads)


def test_packed_equals_record_path():
    from rovaca_tpu.pipeline import ref_confidence
    from rovaca_tpu.assembly import assembler

    class R:
        def __init__(self, start, end):
            self.start, self.end = start, end
            self.is_active = False

    rng = np.random.default_rng(23)
    for trial in range(6):
        ref, reads = _region(rng)
        region = R(300, 549)
        ps, pe = 200, 649

        fin = assembler.finalize_and_adjust(list(reads), ps, pe)
        want = ref_confidence.reference_model_for_no_variation(
            region, fin, ref.encode(), "chr1", padded_span=(ps, pe))

        pk = finalize_native.finalize_region_packed(list(reads), ps, pe)
        assert pk is not None
        got = ref_confidence.reference_model_for_no_variation(
            region, pk, ref.encode(), "chr1", padded_span=(ps, pe))

        def rows(spans):
            out = []
            for s in spans:
                out.append((s.start, len(s), s.pls.tolist(),
                            s.gq.tolist(), s.dp.tolist()))
            return out

        rw = rows(want)
        assert rw == rows(got), f"trial {trial}"
        assert rw and sum(len(r[2]) for r in rw) > 0   # non-vacuous

        # the keep-mask entry (generic substrate of the filtered one)
        # must agree with the filtered path given the same usable mask
        obs = ref_confidence.PositionObs(region.end + 1 - region.start)
        padded_ref = np.frombuffer(ref.encode()[ps:pe + 1], dtype=np.uint8)
        posobs_native.build_position_obs_packed(
            obs, pk, pk.usable_mask(20), padded_ref, ps,
            region.start, region.end + 1)
        got_masked = ref_confidence.reference_confidence_records(
            obs, ref.encode(), "chr1", region.start, {})
        assert rows(got_masked) == rw, f"masked trial {trial}"
