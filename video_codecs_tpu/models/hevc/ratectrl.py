"""Rate control: R-lambda model and legacy URQ quadratic model.

Parity references:
- R-lambda: hm-16.5rc1/source/Lib/TLibEncoder/TEncRateCtrl.cpp —
  lambda = alpha * bpp^beta (estimatePicLambda), QP = 4.2005 ln(lambda)
  + 13.7122, adaptive alpha/beta update (updateAfterPic, update rates
  :96-117), intra alpha=6.7542/beta=1.7860 class defaults, intra-frame
  SATD-based model (RATE_CONTROL_INTRA, alpha 3.2003 / beta -1.367
  :221-222).
- URQ: hm11.0_ratectrl (RATE_CONTROL_LAMBDA_DOMAIN=0, TEncRateCtrl.h:695)
  and jm18.5/lencod/src/rc_quadratic.c (JVT-G012): R = X1*MAD/Q +
  X2*MAD/Q^2, linear MAD prediction, fluid buffer, +-2 QP clamping.

Both controllers share the interface:
    qp = rc.pick_qp()            # before encoding a frame
    rc.update(bits, metric)      # after (metric: SATD or MAD of the frame)
"""

from __future__ import annotations

import math


class RateLambdaControl:
    """Frame-level R-lambda controller (TEncRateCtrl semantics)."""

    def __init__(self, target_bps: float, fps: float, width: int, height: int,
                 base_qp: int = 32) -> None:
        self.pixels = width * height
        self.target_bits_per_frame = target_bps / fps
        self.alpha = 3.2003
        self.beta = -1.367
        self.base_qp = base_qp
        self.prev_qp = base_qp
        self.buffer_error = 0.0  # bits over/under spent so far

    def pick_qp(self) -> int:
        # spend the per-frame budget, paying back 10% of accumulated error
        target = max(self.target_bits_per_frame - 0.1 * self.buffer_error,
                     0.1 * self.target_bits_per_frame)
        bpp = target / self.pixels
        lam = self.alpha * (bpp ** self.beta)
        qp = int(round(4.2005 * math.log(lam) + 13.7122))
        qp = max(self.prev_qp - 2, min(self.prev_qp + 2, qp))
        qp = max(1, min(51, qp))
        self._last_target_bpp = bpp
        self._last_lambda = lam
        self.prev_qp = qp
        return qp

    def update(self, bits_used: float, metric: float = 0.0) -> None:
        self.buffer_error += bits_used - self.target_bits_per_frame
        actual_bpp = max(bits_used / self.pixels, 1e-7)
        # model update (TEncRateCtrl updateAlphaBetaIntra-style)
        lambda_comp = self.alpha * (actual_bpp ** self.beta)
        delta = math.log(self._last_lambda) - math.log(lambda_comp)
        self.alpha *= math.exp(0.10 * delta)
        self.alpha = min(max(self.alpha, 0.05), 20.0)
        self.beta += 0.05 * delta * math.log(actual_bpp)
        self.beta = min(max(self.beta, -3.0), -0.1)


class UrqQuadraticControl:
    """Legacy URQ quadratic controller (JVT-G012 / hm11.0_ratectrl)."""

    def __init__(self, target_bps: float, fps: float, width: int, height: int,
                 base_qp: int = 32) -> None:
        self.pixels = width * height
        self.target_bits_per_frame = target_bps / fps
        self.x1 = 0.25 * self.target_bits_per_frame  # first-order model term
        self.x2 = 0.0
        self.mad_pred = 8.0
        self.mad_a1, self.mad_a2 = 1.0, 0.0
        self.prev_mad = 8.0
        self.prev_qp = base_qp
        self.buffer_error = 0.0

    @staticmethod
    def _qstep(qp: float) -> float:
        return (2.0 ** ((qp - 4) / 6.0)) * 0.625

    @staticmethod
    def _qp_from_qstep(qs: float) -> int:
        return int(round(4 + 6 * math.log2(max(qs, 1e-6) / 0.625)))

    def pick_qp(self) -> int:
        target = max(self.target_bits_per_frame - 0.1 * self.buffer_error,
                     0.1 * self.target_bits_per_frame)
        mad = self.mad_a1 * self.prev_mad + self.mad_a2
        self.mad_pred = mad
        # solve X1*MAD/Q + X2*MAD/Q^2 = target for Qstep
        a = target
        b = -self.x1 * mad
        c = -self.x2 * mad
        if self.x2 == 0.0 or b * b - 4 * a * c < 0:
            qs = self.x1 * mad / target
        else:
            qs = (-b + math.sqrt(b * b - 4 * a * c)) / (2 * a)
        qp = self._qp_from_qstep(qs)
        qp = max(self.prev_qp - 2, min(self.prev_qp + 2, qp))
        qp = max(1, min(51, qp))
        self._last_qs = self._qstep(qp)
        self.prev_qp = qp
        return qp

    def update(self, bits_used: float, mad: float) -> None:
        self.buffer_error += bits_used - self.target_bits_per_frame
        mad = max(mad, 1e-3)
        # first-order model refresh (windowed regression collapsed to the
        # latest observation with damping, as in rc_quadratic's sliding fit)
        x1_obs = bits_used * self._last_qs / mad
        self.x1 = 0.75 * self.x1 + 0.25 * x1_obs
        self.mad_a1 = 0.75 * self.mad_a1 + 0.25 * (mad / max(self.prev_mad, 1e-3))
        self.mad_a1 = min(max(self.mad_a1, 0.2), 3.0)
        self.prev_mad = mad


class GopRateLambdaControl(RateLambdaControl):
    """R-lambda control with GOP-level bit allocation and hierarchical
    per-level weights (TEncRateCtrl.cpp:311-321 xCalEquaCoeff/adaptive
    ratio semantics, collapsed to the lambda-ratio weight table).

    gop_qp_offsets: per-position QP offsets of the GOP structure (e.g.
    GOPEntry qp_offset column); bits are allocated proportionally to
    2^(-offset/3) — the R-lambda equivalent of HM's hierarchical lambda
    ratios — then each picture runs the frame-level model on its share.
    """

    def __init__(self, target_bps: float, fps: float, width: int,
                 height: int, base_qp: int = 32,
                 gop_qp_offsets: tuple = (0,)) -> None:
        super().__init__(target_bps, fps, width, height, base_qp)
        self.weights = [2.0 ** (-o / 3.0) for o in gop_qp_offsets]
        self.gop_size = len(self.weights)
        self._pos = 0

    def pick_qp(self) -> int:
        if self._pos == 0:
            # GOP target: gop_size frame budgets, paying back 20% of the
            # accumulated buffer error over the GOP (fluid buffer)
            gop_bits = self.gop_size * self.target_bits_per_frame \
                - 0.2 * self.buffer_error
            gop_bits = max(gop_bits,
                           0.1 * self.gop_size * self.target_bits_per_frame)
            wsum = sum(self.weights)
            self._alloc = [gop_bits * w / wsum for w in self.weights]
        target = max(self._alloc[self._pos],
                     0.05 * self.target_bits_per_frame)
        self._pos = (self._pos + 1) % self.gop_size
        bpp = target / self.pixels
        lam = self.alpha * (bpp ** self.beta)
        qp = int(round(4.2005 * math.log(lam) + 13.7122))
        qp = max(self.prev_qp - 3, min(self.prev_qp + 3, qp))
        qp = max(1, min(51, qp))
        self._last_target_bpp = bpp
        self._last_lambda = lam
        self.prev_qp = qp
        return qp


class CtuRateControl:
    """CTU-level QP allocation (TEncRateCtrl getLCUTargetBpp +
    getLCUEstLambdaAndQP semantics).

    Per picture: each CTU's bit share is proportional to its complexity
    weight (the ME SATD of the block — HM uses the per-LCU MAD/SATD
    estimate); the per-CTU lambda follows from the frame R-lambda model
    and maps to a QP offset, clipped to frame QP +-2 (HM's LCU QP clip).
    """

    def __init__(self, clip: int = 2) -> None:
        self.clip = clip

    def ctu_qps(self, frame_qp: int, weights):
        import numpy as np

        w = np.asarray(weights, np.float64) + 1.0
        # lambda_i / lambda_frame = (bpp_frame / bpp_i)^|beta| with
        # bpp_i proportional to w_i: cheaper CTUs get larger lambda (higher
        # QP), complex CTUs smaller lambda (HM equation 5.3 shape).
        rel = np.log2(w / np.exp(np.log(w).mean()))
        dqp = -np.round(rel).astype(int)
        qps = np.clip(frame_qp + dqp, frame_qp - self.clip,
                      frame_qp + self.clip)
        return np.clip(qps, 1, 51)
