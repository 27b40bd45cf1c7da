"""Static per-graph configuration shared by all op builders."""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class GraphSpec:
    """Static shape/mode info for building a mastering graph.

    sr        — sample rate (Hz)
    n         — track length in samples (static; bucketing pads to this)
    channels  — channel count (1 or 2)
    exact     — True: scipy-parity edge emulation for zero-phase filters
                (two FFT passes/filter); False: fused |H|² single-pass mode
                (same magnitude response, edge transients differ within one
                settle length of the track ends — production default).
    """

    sr: int
    n: int
    channels: int = 2
    exact: bool = True
    hybrid: bool = True

    @property
    def nyq(self) -> float:
        return self.sr / 2.0
