"""Zero-phase filter pass descriptor — the building block for EQ-style ops.

A ``ZP`` bundles the static metadata of one ``filtfilt``-equivalent pass (FFT
size, scipy pad length, settle length, exact/fast mode) with the host-designed
response array.  The response is a *parameter* (device input), never a traced
constant, so graphs stay small and responses are shared across batches.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..spec import GraphSpec
from . import design
from .fdfilter import filtfilt_fd, lfilter_fd


def scipy_padlen(ba_pairs) -> int:
    """scipy.signal.filtfilt default padlen for a single (b, a): 3*max(len)."""
    return max(3 * max(len(np.atleast_1d(b)), len(np.atleast_1d(a))) for b, a in ba_pairs)


def pack_complex(H: np.ndarray) -> np.ndarray:
    """complex response -> float32 [2, n] (real, imag).

    Device params must be real: complex64 host<->device transfers are
    unimplemented on the axon TPU relay (empirically: any complex device_put
    wedges the session), so responses travel as stacked real/imag planes and
    are recombined in-graph.
    """
    return np.stack([H.real, H.imag]).astype(np.float32)


def unpack_complex(p):
    import jax

    return jax.lax.complex(p[0], p[1])


@dataclass
class ZP:
    """One zero-phase pass.  ``resp``: complex64 H (exact) or float32 |H|²
    (fast / combined).  Call with the device-resident response."""

    nfft: int
    padlen: int
    settle: int
    exact: bool
    resp: np.ndarray = field(repr=False)  # exact: f32 [2, n] packed complex

    def __call__(self, x, resp_dev):
        H = unpack_complex(resp_dev) if self.exact else resp_dev
        if self.padlen >= x.shape[-1]:
            # scipy filtfilt raises for padlen >= n; the reference's
            # _safe_filtfilt then falls back to causal lfilter (exact mode).
            # Fast mode has no causal response — bypass (sub-10-sample inputs).
            return lfilter_fd(x, H, self.nfft) if self.exact else x
        return filtfilt_fd(
            x, H, self.nfft,
            padlen=self.padlen, settle=self.settle, exact=self.exact,
        )


def make_zp(spec: GraphSpec, ba_pairs, nfft: int | None = None) -> ZP:
    """Zero-phase pass for a cascade of (b, a) pairs.

    In exact mode a *single-pair* cascade reproduces one scipy filtfilt call;
    multi-pair cascades are mathematically the product response (callers that
    need call-for-call scipy parity build one ZP per pair).
    """
    settle = design.settle_len(*ba_pairs)
    padlen = scipy_padlen(ba_pairs)
    if nfft is None:
        nfft = design.next_fft_size(spec.n + 2 * padlen + 3 * settle + 16)
    if spec.exact:
        resp = pack_complex(design.cascade_response(ba_pairs, nfft))
    else:
        resp = design.zero_phase_power(ba_pairs, nfft).astype(np.float32)
    return ZP(nfft=nfft, padlen=padlen, settle=settle, exact=spec.exact, resp=resp)


def make_zp_from_power(spec: GraphSpec, power: np.ndarray, nfft: int,
                       padlen: int, settle: int) -> ZP:
    """Fast-mode pass from an arbitrary combined real power response (e.g.
    ``Π(1+(g-1)|Hb|²)`` for sequential parallel-band EQs)."""
    return ZP(nfft=nfft, padlen=padlen, settle=settle, exact=False,
              resp=power.astype(np.float32))
