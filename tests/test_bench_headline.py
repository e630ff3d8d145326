"""Unit tests for bench.py's headline-basis selection.

The basis rules decide what number the round reports, and round 4 found a
tunnel failure mode where wall clocks are physically impossible
(block_until_ready acking early: 0.09 ms/step "wall" vs 126.0 ms
device-busy for the same program). These pin the sanity gates without
touching a device — compute_headline is pure host-side logic.
"""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from bench import BATCH, compute_headline  # noqa: E402

pytestmark = pytest.mark.smoke


def _run(extras, leg_errors=None, baseline=None):
    return compute_headline(dict(extras), dict(leg_errors or {}), baseline)


def test_ingraph_wall_preferred_when_plausible():
    out = _run({
        "n_chips": 1,
        "device_busy_ms_per_step_bf16": 126.0,
        "ingraph_wall_ms_per_step_bf16": 127.5,
    })
    assert out["extras"]["value_basis"] == "ingraph_wall_bf16"
    assert out["extras"]["ingraph_wall_reliable"] is True
    assert out["value"] == round(BATCH * 1e3 / 127.5, 3)


def test_implausibly_fast_wall_falls_back_to_device_busy():
    # the measured round-4 anomaly: 0.09 ms/step "wall" vs 126.0 busy
    out = _run({
        "n_chips": 1,
        "device_busy_ms_per_step_bf16": 126.0,
        "ingraph_wall_ms_per_step_bf16": 0.09,
    })
    assert out["extras"]["value_basis"] == "device_busy_bf16"
    assert out["extras"]["ingraph_wall_reliable"] is False
    assert out["value"] == round(BATCH * 1e3 / 126.0, 3)


def test_wall_within_ten_percent_of_busy_is_plausible():
    # the gate is >= 0.9x busy, not >= busy: profiler attribution noise
    out = _run({
        "n_chips": 1,
        "device_busy_ms_per_step_bf16": 126.0,
        "ingraph_wall_ms_per_step_bf16": 120.0,
    })
    assert out["extras"]["value_basis"] == "ingraph_wall_bf16"


def test_busy_fp32_when_no_bf16():
    out = _run({"n_chips": 1, "device_busy_ms_per_step_fp32": 169.1})
    assert out["extras"]["value_basis"] == "device_busy_fp32"
    assert out["value"] == round(BATCH * 1e3 / 169.1, 3)


def test_ingraph_without_cross_check_is_flagged():
    out = _run({"n_chips": 1, "ingraph_wall_ms_per_step_bf16": 130.0})
    assert "no device-busy cross-check" in out["extras"]["value_basis"]


def test_ingraph_self_busy_cross_checks_without_train_leg():
    # round-4 07:11 failure mode, now with the ingraph leg's own trace:
    # the memoized 0.09 ms wall is caught even when the train leg died
    out = _run({
        "n_chips": 1,
        "ingraph_wall_ms_per_step_bf16": 0.09,
        "ingraph_busy_ms_per_step_bf16": 126.0,
    }, leg_errors={"train": "timeout after 1800s"})
    assert out["extras"]["value_basis"] == "device_busy_bf16 (ingraph trace)"
    assert out["value"] == round(BATCH * 1e3 / 126.0, 3)
    assert out["extras"]["ingraph_wall_reliable"] is False


def test_flops_floor_rejects_memoized_wall_with_no_busy_at_all():
    # worst case: every profiler trace died too. 0.09 ms/step at 14.8
    # TFLOP/step would be ~164 PFLOP/s on one chip — physically impossible,
    # so the headline must be null rather than 355k imgs/s.
    out = _run({
        "n_chips": 1,
        "ingraph_wall_ms_per_step_bf16": 0.09,
        "flops_per_step_ingraph_lb": 14.8e12,
    })
    assert out["value"] is None
    assert "physically impossible" in out["extras"]["leg_errors"]["headline"]
    assert out["extras"]["ingraph_wall_physical"] is False


def test_flops_floor_catches_memoized_wall_even_at_k_fold_lower_bound():
    # XLA counts the while body once, so the ingraph FLOP count can be
    # TRAIN_STEPS-fold low (measured: 0.74e12 vs 14.8e12 true). Even that
    # floor (3.8 ms) catches the sub-0.1 ms memoized acks.
    out = _run({
        "n_chips": 1,
        "ingraph_wall_ms_per_step_bf16": 0.09,
        "flops_per_step_ingraph_lb": 0.741e12,
    })
    assert out["value"] is None
    assert out["extras"]["ingraph_wall_physical"] is False


def test_flops_floor_passes_honest_uncross_checked_wall():
    out = _run({
        "n_chips": 1,
        "ingraph_wall_ms_per_step_bf16": 130.0,
        "flops_per_step_ingraph_lb": 14.8e12,
    })
    assert "no device-busy cross-check" in out["extras"]["value_basis"]
    assert out["extras"]["ingraph_wall_physical"] is True
    assert out["value"] == round(BATCH * 1e3 / 130.0, 3)


def test_honest_bf16_wall_beats_fp32_busy_when_strong_floor_passes():
    # both bf16 busy traces died but the train leg's accurate FLOP count
    # survived: an honest bf16 wall clearing that tight floor must not be
    # discarded for the slower fp32 busy number
    out = _run({
        "n_chips": 1,
        "device_busy_ms_per_step_fp32": 169.1,
        "ingraph_wall_ms_per_step_bf16": 127.4,
        "flops_per_step": 14.8e12,
    })
    assert out["extras"]["value_basis"].startswith("ingraph_wall_bf16")
    assert out["value"] == round(BATCH * 1e3 / 127.4, 3)


def test_partially_memoized_wall_loses_to_fp32_busy_with_weak_floor_only():
    # only the K-fold-low ingraph FLOP bound exists (floor 3.8 ms): a
    # 10 ms partially-memoized wall clears it, so it must NOT outrank the
    # measured fp32 busy
    out = _run({
        "n_chips": 1,
        "device_busy_ms_per_step_fp32": 169.1,
        "ingraph_wall_ms_per_step_bf16": 10.0,
        "flops_per_step_ingraph_lb": 0.741e12,
    })
    assert out["extras"]["value_basis"] == "device_busy_fp32"


def test_floor_uses_tightest_available_flop_count():
    # max(lb, train) — with the accurate 14.8e12 present, a 10 ms wall is
    # below the 75 ms floor and the headline must be null, even though the
    # weak lb floor alone would have passed it
    out = _run({
        "n_chips": 1,
        "ingraph_wall_ms_per_step_bf16": 10.0,
        "flops_per_step_ingraph_lb": 0.741e12,
        "flops_per_step": 14.8e12,
    })
    assert out["value"] is None
    assert out["extras"]["ingraph_wall_physical"] is False


def test_flops_floor_rejects_memoized_fp32_wall():
    out = _run({
        "n_chips": 1,
        "wall_ms_per_step_fp32": 0.05,
        "flops_per_step": 14.8e12,
    })
    assert out["value"] is None


def test_no_mfu_from_ingraph_flops_lower_bound():
    # the ingraph FLOP count is a K-fold lower bound — valid floor, but an
    # MFU computed from it would be nonsense, so none must be reported
    out = _run({
        "n_chips": 1,
        "ingraph_wall_ms_per_step_bf16": 127.0,
        "ingraph_busy_ms_per_step_bf16": 126.0,
        "flops_per_step_ingraph_lb": 0.741e12,
    })
    assert out["extras"]["value_basis"] == "ingraph_wall_bf16"
    assert "mfu_bf16" not in out["extras"]


def test_wall_clock_last_resort():
    out = _run({"n_chips": 1, "wall_ms_per_step_fp32": 200.0})
    assert out["extras"]["value_basis"].startswith("wall_clock")


def test_nothing_measured_returns_null_value():
    out = _run({"n_chips": 1}, leg_errors={"train": "timeout after 1800s"})
    assert out["value"] is None
    assert out["vs_baseline"] is None
    assert out["extras"]["leg_errors"]["train"].startswith("timeout")


def test_serving_wall_reliability_flag():
    out = _run({
        "n_chips": 1,
        "device_busy_ms_per_step_bf16": 126.0,
        "ingraph_wall_ms_per_step_bf16": 127.0,
        "serving_wall_ms_per_batch_bf16": 5.0,
        "serving_busy_ms_per_batch_bf16": 37.2,
    })
    assert out["extras"]["serving_wall_reliable"] is False
    assert out["extras"]["serving_imgs_per_sec_bf16"] == round(
        BATCH * 1e3 / 37.2, 1
    )


def test_n_chips_divides_throughput_and_baseline_ratio():
    out = _run(
        {"n_chips": 4, "device_busy_ms_per_step_bf16": 126.0},
        baseline=10.0,
    )
    per_chip = BATCH * 1e3 / 126.0 / 4
    assert out["value"] == round(per_chip, 3)
    assert out["vs_baseline"] == round(per_chip / 10.0, 3)


def test_mfu_extra():
    out = _run({
        "n_chips": 1,
        "device_busy_ms_per_step_bf16": 126.0,
        "ingraph_wall_ms_per_step_bf16": 127.0,
        "flops_per_step": 14.8e12,
    })
    assert out["extras"]["mfu_bf16"] == round(
        14.8e12 / 0.126 / 197e12, 4
    )


def test_serving_ingraph_wall_preferred_when_reliable():
    """Round-5: the in-graph K-batch serving loop is the self-checking wall
    (VERDICT r4 #3) — when consistent with busy it sets the reliability flag
    and becomes the serving throughput basis."""
    out = _run({
        "n_chips": 1,
        "device_busy_ms_per_step_bf16": 126.0,
        "ingraph_wall_ms_per_step_bf16": 127.0,
        "serving_wall_ms_per_batch_bf16": 0.35,   # early-acked garbage
        "serving_ingraph_wall_ms_per_batch_bf16": 37.8,
        "serving_busy_ms_per_batch_bf16": 37.2,
    })
    assert out["extras"]["serving_wall_reliable"] is True
    assert out["extras"]["serving_value_basis"] == "serving_ingraph_wall_bf16"
    assert out["extras"]["serving_imgs_per_sec_bf16"] == round(
        BATCH * 1e3 / 37.8, 1
    )


def test_serving_ingraph_wall_below_busy_falls_back():
    """A memoized/early-acked in-graph serving wall (< 0.9x busy) must not
    become the serving basis — busy wins, flag False."""
    out = _run({
        "n_chips": 1,
        "device_busy_ms_per_step_bf16": 126.0,
        "ingraph_wall_ms_per_step_bf16": 127.0,
        "serving_ingraph_wall_ms_per_batch_bf16": 0.4,
        "serving_busy_ms_per_batch_bf16": 37.2,
    })
    assert out["extras"]["serving_wall_reliable"] is False
    assert out["extras"]["serving_value_basis"] == "serving_busy_bf16"
    assert out["extras"]["serving_imgs_per_sec_bf16"] == round(
        BATCH * 1e3 / 37.2, 1
    )


def test_flops_floor_has_no_n_chips_slack():
    """cost_analysis FLOPs are PER-DEVICE for SPMD programs (probed on the
    8-dev CPU mesh: an 8-way-sharded matmul reports 2N^3/8), so the wall
    floor is per-device FLOPs over ONE chip's peak. Pre-round-5 the floor
    divided by n_chips too, an n-fold-loose gate on any multi-chip run."""
    # 14.8e12 per-device FLOPs -> floor 75.1 ms at 197 TFLOP/s; a 10 ms
    # wall must be rejected even on an 8-chip mesh (old code allowed it:
    # 14.8e12/(197e12*8) = 9.4 ms floor)
    out = _run({
        "n_chips": 8,
        "ingraph_wall_ms_per_step_bf16": 10.0,
        "flops_per_step_ingraph_lb": 14.8e12,
    })
    assert out["value"] is None
    assert out["extras"]["ingraph_wall_physical"] is False


def test_polluted_train_busy_does_not_demote_consistent_ingraph_pair():
    """Replay of the round-5 final-gate failure: during a relay flap the
    train leg's trace caught a burst of early-acked queued dispatches
    (2679 ms/step "busy" vs the settled 126) while the ingraph leg's OWN
    pair stayed consistent (127.29 wall vs 125.85 busy). The wall must be
    cross-checked against its own leg's busy — not demoted to the other
    leg's polluted number (which reported 11.9 imgs/s and MFU 0.028 for a
    0.597-MFU step)."""
    out = _run({
        "n_chips": 1,
        "device_busy_ms_per_step_bf16": 2679.39,   # polluted
        "ingraph_busy_ms_per_step_bf16": 125.85,   # self-consistent pair
        "ingraph_wall_ms_per_step_bf16": 127.29,
        "flops_per_step": 14.8e12,
    })
    assert out["extras"]["value_basis"] == "ingraph_wall_bf16"
    assert out["extras"]["ingraph_wall_reliable"] is True
    assert out["value"] == round(BATCH * 1e3 / 127.29, 3)
    assert out["extras"]["busy_sources_disagree"] == round(2679.39 / 125.85, 2)
    # MFU uses the ig-preferred busy, not the polluted train trace
    assert out["extras"]["mfu_bf16"] == round(
        14.8e12 / (125.85 / 1e3) / 197e12, 4
    )


def test_polluted_ingraph_busy_does_not_demote_honest_wall_either():
    """Mirror of the previous test: the burst can land in EITHER leg's
    trace. With the train busy honest and the ingraph busy polluted, the
    min-of-sources rule keeps the honest cross-check and the wall basis."""
    out = _run({
        "n_chips": 1,
        "device_busy_ms_per_step_bf16": 126.0,      # honest
        "ingraph_busy_ms_per_step_bf16": 2679.39,   # polluted
        "ingraph_wall_ms_per_step_bf16": 127.29,
        "flops_per_step": 14.8e12,
    })
    assert out["extras"]["value_basis"] == "ingraph_wall_bf16"
    assert out["extras"]["ingraph_wall_reliable"] is True
    assert out["value"] == round(BATCH * 1e3 / 127.29, 3)
    assert out["extras"]["busy_sources_disagree"] == round(2679.39 / 126.0, 2)
    assert out["extras"]["mfu_bf16"] == round(
        14.8e12 / (126.0 / 1e3) / 197e12, 4
    )
