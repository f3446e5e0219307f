"""Spectral arc length (SPARC) smoothness metric.

Fresh implementation of the modified spectral arc length measure used by the
reference for trajectory smoothness (``/root/reference/mpinets/third_party/
sparc.py:102-128``; called from ``mpinets/metrics.py:386-409`` with
``fs = 1/dt``). Definition (Balasubramanian et al., 2015): the negative arc
length of the frequency-normalized magnitude spectrum of the speed profile,
restricted to a low-pass band [0, fc] and then trimmed to the first..last
samples above an amplitude threshold.

Two variants:

* :func:`sparc` -- scalar numpy version, semantically identical to the
  reference (same padlevel/fc/amp_th defaults, same all-zero early-out).
  Used by the host-side :class:`mpinets_tpu.eval.metrics.Evaluator` where
  per-problem trajectory lengths vary.
* :func:`sparc_batched` -- static-shape jnp version for fixed-length speed
  profiles (e.g. validation rollouts), vmapped over the batch with the
  data-dependent threshold window expressed as masks.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np


def sparc(
    movement: np.ndarray,
    fs: float,
    padlevel: int = 4,
    fc: float = 10.0,
    amp_th: float = 0.05,
) -> float:
    """Spectral arc length of a 1-D speed profile. More negative = smoother.

    Returns 0.0 for an all-zero profile (the reference's convention for a
    policy that never moves, ``sparc.py:98-100``).
    """
    movement = np.asarray(movement, dtype=np.float64)
    if np.allclose(movement, 0):
        return 0.0
    nfft = int(2 ** (math.ceil(math.log2(len(movement))) + padlevel))
    freqs = np.arange(0, fs, fs / nfft)
    mag = np.abs(np.fft.fft(movement, nfft))
    mag = mag / mag.max()

    # Low-pass band, then amplitude-threshold trim to [first, last] >= amp_th.
    band = freqs <= fc
    f_sel, m_sel = freqs[band], mag[band]
    above = np.flatnonzero(m_sel >= amp_th)
    f_sel = f_sel[above[0] : above[-1] + 1]
    m_sel = m_sel[above[0] : above[-1] + 1]

    df = np.diff(f_sel) / (f_sel[-1] - f_sel[0])
    dm = np.diff(m_sel)
    return float(-np.sum(np.sqrt(df * df + dm * dm)))


def sparc_batched(
    movement: jnp.ndarray,
    fs: float,
    padlevel: int = 4,
    fc: float = 10.0,
    amp_th: float = 0.05,
) -> jnp.ndarray:
    """Batched SPARC over fixed-length speed profiles.

    :param movement: [..., T] speed profiles (all the same length T).
    :returns: [...] spectral arc lengths.

    The amplitude-threshold window (a data-dependent contiguous index range
    in the scalar version) is expressed with masks so the whole computation
    is static-shape and jit-able: a frequency-step segment contributes to the
    arc length iff it lies between the first and last above-threshold samples
    of the low-passed spectrum.
    """
    t = movement.shape[-1]
    nfft = int(2 ** (math.ceil(math.log2(t)) + padlevel))
    freqs = jnp.arange(0, nfft, dtype=movement.dtype) * (fs / nfft)
    mag = jnp.abs(jnp.fft.fft(movement, n=nfft, axis=-1))
    mag = mag / jnp.max(mag, axis=-1, keepdims=True)

    band = freqs <= fc  # static mask [nfft]
    above = band & (mag >= amp_th)  # [..., nfft]
    idx = jnp.arange(nfft)
    first = jnp.min(jnp.where(above, idx, nfft), axis=-1)  # [...]
    last = jnp.max(jnp.where(above, idx, -1), axis=-1)

    in_window = (idx >= first[..., None]) & (idx <= last[..., None]) & band
    # Segment k spans samples k -> k+1; valid iff both endpoints in window.
    seg = in_window[..., :-1] & in_window[..., 1:]

    f_lo = jnp.take(freqs, jnp.maximum(first, 0))
    f_hi = jnp.take(freqs, jnp.maximum(last, 0))
    f_range = jnp.maximum(f_hi - f_lo, 1e-12)

    df = jnp.diff(freqs) / f_range[..., None]
    dm = jnp.diff(mag, axis=-1)
    arc = -jnp.sum(jnp.where(seg, jnp.sqrt(df * df + dm * dm), 0.0), axis=-1)

    all_zero = jnp.all(jnp.abs(movement) <= 1e-8, axis=-1)
    return jnp.where(all_zero, 0.0, arc)
