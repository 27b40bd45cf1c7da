"""Zero-phase filter passes — the building blocks for EQ-style ops.

Three execution strategies, selected by the GraphSpec:

- two-pass exact (``exact=True, hybrid=False``): odd extension + steady-state
  prefix emulation of scipy ``filtfilt`` — two full-length FFT passes per
  filter call.  Bit-faithful but FFT-heavy.
- fast (``exact=False``): one full-length pass multiplying by the combined
  ``|H|²`` power response.  Identical to exact in the interior; differs from
  scipy only within one settle length of the track edges.
- hybrid (``exact=True, hybrid=True`` — the default): fast pass for the whole
  track plus exact two-pass recomputation of the two edge windows, spliced.
  The fast interior and exact interior agree to the IR-truncation level, so
  the result is exact everywhere at roughly half (or, for multi-call ops,
  1/2k-th) of the FFT cost.

Every filter object exposes ``.params`` (a list of real float32 host arrays —
complex responses travel as stacked real/imag planes because complex
host↔device transfers are unimplemented on the TPU relay) and is called as
``filt(x, params)`` with the device-resident version of that list.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field

import numpy as np
import jax
import jax.numpy as jnp

from ..spec import GraphSpec
from . import design
from .fdfilter import filtfilt_fd, lfilter_fd


def scipy_padlen(ba_pairs) -> int:
    """scipy.signal.filtfilt default padlen for a single (b, a): 3*max(len)."""
    return max(3 * max(len(np.atleast_1d(b)), len(np.atleast_1d(a))) for b, a in ba_pairs)


def pack_complex(H: np.ndarray) -> np.ndarray:
    """complex response -> float32 [2, n] (real, imag) for device transfer."""
    return np.stack([H.real, H.imag]).astype(np.float32)


def unpack_complex(p):
    return jax.lax.complex(p[0], p[1])


@dataclass
class ZP:
    """One zero-phase pass (two-pass exact or fast).

    Fast passes at Pallas-eligible sizes (ops.fft_pallas.enabled) carry the
    permuted full-spectrum response instead of the half power response and
    run through the staged Pallas FFT (~1.6x faster than XLA's on v5e)."""

    nfft: int
    padlen: int
    settle: int
    exact: bool
    params: list = field(repr=False)  # [resp]: packed complex (exact) | f32 power
    pallas: bool = False

    def __call__(self, x, params):
        from . import validctx

        resp = params[0]
        nv = validctx.n_valid()
        if self.padlen >= x.shape[-1]:
            # scipy filtfilt raises for padlen >= n; the reference's
            # _safe_filtfilt then falls back to causal lfilter (exact mode).
            # Fast mode has no causal response — bypass (sub-10-sample input).
            if self.exact:
                return lfilter_fd(x, unpack_complex(resp), self.nfft)
            return x
        if self.pallas:
            from .fdfilter import odd_ext, odd_ext_valid
            from . import fft_pallas as fp

            n = x.shape[-1]
            p = min(self.padlen, max(n - 1, 0))
            # extend + zero-pad to nfft in one concatenate; apply_response
            # then skips its own pad pass.
            core = (odd_ext(x, p, pad_to=self.nfft) if nv is None
                    else odd_ext_valid(x, p, nv, pad_to=self.nfft))
            y = fp.apply_response(core, resp, self.nfft, tables=params[1])
            return validctx.mask_tail(y[..., p:p + n], nv)
        H = unpack_complex(resp) if self.exact else resp
        return filtfilt_fd(
            x, H, self.nfft,
            padlen=self.padlen, settle=self.settle, exact=self.exact, nv=nv,
        )


@dataclass
class HybridZP:
    """Fast full pass + exact edge windows, spliced (see module docstring)."""

    n: int
    L: int
    w_in: int
    fast: ZP
    small: ZP

    @property
    def params(self):
        return [self.fast.params, self.small.params]

    def __call__(self, x, params):
        from . import validctx

        pf, ps = params
        nv = validctx.n_valid()
        xr = validctx.right_window(x, self.w_in, nv)
        # The fast interior and the extracted edge windows have their track
        # ends at static positions — run them with the context cleared; the
        # dynamic anchoring happens in the window extraction and the splice.
        with validctx.cleared():
            y = self.fast(x, pf)
            # both edge windows in one stacked pass (halves small-FFT
            # dispatches)
            ylr = self.small(jnp.stack([x[..., : self.w_in], xr]), ps)
        return validctx.splice(y, ylr[0], ylr[1], self.n, self.L, nv)


@dataclass
class PreLTI:
    """A pure-LTI op to fuse *in front of* a multi-response split so the
    forward FFT is shared (see ops.bands.band_split_plan and ops.fused).

    ``power(nfft)`` returns the op's zero-phase power response (float64,
    rFFT grid); ``small_build(spec)`` returns the exact two-pass
    ``(params, fn)`` at window size for edge splicing."""

    settle: int
    padlen: int
    power: object       # Callable[[int], np.ndarray]
    small_build: object  # Callable[[GraphSpec], tuple[list, Callable]]


def _edge_windows(settle: int, padlen: int, n: int) -> tuple[int, int]:
    L = settle + padlen + 256
    w_in = min(n, L + settle + padlen + 256)
    return L, w_in


def make_zp(spec: GraphSpec, ba_pairs, nfft: int | None = None):
    """Zero-phase pass for a cascade of (b, a) pairs, strategy per spec.

    In exact modes a *single-pair* cascade reproduces one scipy filtfilt
    call; multi-pair cascades compose the calls (two-pass applies them as a
    product response, which is exact in the interior; per-call scipy edge
    semantics are preserved by building one ZP per pair where it matters).
    """
    settle = design.settle_len(*ba_pairs)
    padlen = scipy_padlen(ba_pairs)

    def build(exact: bool, n: int, nfft_in=None):
        from . import fft_pallas as fp

        nfft_l = nfft_in or design.next_fft_size(n + 2 * padlen + 3 * settle + 16)
        if exact:
            resp = pack_complex(design.cascade_response(ba_pairs, nfft_l))
            return ZP(nfft=nfft_l, padlen=padlen, settle=settle, exact=True,
                      params=[resp])
        power = design.zero_phase_power(ba_pairs, nfft_l)
        if fp.enabled(nfft_l):
            return ZP(nfft=nfft_l, padlen=padlen, settle=settle, exact=False,
                      params=[fp.permute_full_response(power, nfft_l),
                              fp.plan_params(nfft_l)],
                      pallas=True)
        return ZP(nfft=nfft_l, padlen=padlen, settle=settle, exact=False,
                  params=[power.astype(np.float32)])

    if not spec.exact:
        return build(False, spec.n, nfft)
    L, w_in = _edge_windows(settle, padlen, spec.n)
    if not spec.hybrid or 2 * w_in + 16 >= spec.n:
        return build(True, spec.n, nfft)
    return HybridZP(n=spec.n, L=L, w_in=w_in,
                    fast=build(False, spec.n, nfft),
                    small=build(True, w_in))


def make_zp_from_power(spec: GraphSpec, power: np.ndarray, nfft: int,
                       padlen: int, settle: int) -> ZP:
    """Fast-mode pass from an arbitrary combined real power response (e.g.
    ``Π(1+(g-1)|Hb|²)`` for sequential parallel-band EQs)."""
    from . import fft_pallas as fp

    if fp.enabled(nfft):
        return ZP(nfft=nfft, padlen=padlen, settle=settle, exact=False,
                  params=[fp.permute_full_response(power, nfft),
                          fp.plan_params(nfft)], pallas=True)
    return ZP(nfft=nfft, padlen=padlen, settle=settle, exact=False,
              params=[power.astype(np.float32)])


def hybridize_op(spec: GraphSpec, settle: int, padlen: int, build):
    """Op-level hybrid: ``build(spec)`` must honor spec.exact/hybrid and
    return ``(params, fn)``.  Wraps the op's own fast variant (whole track)
    with its own two-pass-exact variant (edge windows only).

    Only valid for pure-LTI position-independent ops (no data-dependent
    state, no fades)."""
    L, w_in = _edge_windows(settle, padlen, spec.n)
    if not spec.exact:
        return build(spec)
    if not spec.hybrid or 2 * w_in + 16 >= spec.n:
        return build(dataclasses.replace(spec, hybrid=False))
    p_small, f_small = build(
        dataclasses.replace(spec, n=w_in, hybrid=False))
    p_fast, f_fast = build(dataclasses.replace(spec, exact=False))
    params = [p_fast, p_small]
    n = spec.n

    def fn(x, params):
        from . import validctx

        pf, ps = params
        nv = validctx.n_valid()
        xr = validctx.right_window(x, w_in, nv)
        with validctx.cleared():
            y = f_fast(x, pf)
            ylr = f_small(jnp.stack([x[..., :w_in], xr]), ps)
        return validctx.splice(y, ylr[0], ylr[1], n, L, nv)

    return params, fn
