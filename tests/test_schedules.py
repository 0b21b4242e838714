import math

import numpy as np
import pytest

from tmv_tpu.core.schedules import (
    cosine_lr_schedule, scaled_lr, shadow_loss_decay,
)


class TestCosineSchedule:
    def test_linear_warmup(self):
        s = cosine_lr_schedule(0.08, 0.008, 100, 1000)
        assert float(s(0)) == pytest.approx(0.008)
        assert float(s(50)) == pytest.approx(0.008 + 0.5 * (0.08 - 0.008))

    def test_cosine_phase_uses_raw_step(self):
        # reference quirk: cos(pi * step / decay_steps), step NOT shifted by
        # warmup (efficientnet/train.py:60-62)
        s = cosine_lr_schedule(0.08, 0.008, 100, 1000)
        want = 0.5 * 0.08 * (1 + math.cos(math.pi * 450 / 900))
        assert float(s(450)) == pytest.approx(want, rel=1e-6)

    def test_end_of_schedule_near_zero(self):
        s = cosine_lr_schedule(0.08, 0.008, 100, 1000)
        assert float(s(900)) == pytest.approx(0.0, abs=1e-8)

    def test_batch_scaling(self):
        assert scaled_lr(0.08, 64) == pytest.approx(0.08)
        assert scaled_lr(0.08, 8) == pytest.approx(0.01)


class TestShadowLossDecay:
    def test_warmup_ramp_then_cap(self):
        assert float(shadow_loss_decay(0)) == pytest.approx(1 / 1000)
        assert float(shadow_loss_decay(999)) == pytest.approx(1000 / 1999)
        assert float(shadow_loss_decay(10**6)) == pytest.approx(0.9)
