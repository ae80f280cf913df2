"""Quantitative spike-pattern metrics for the 3D Rosensweig instability.

BASELINE.json asks for "spike-pattern parity vs CUDA ref" on the north-star
scene (demo_3d_LBM_Rosensweig_instability.py).  The instability is seeded
by noise and is chaotic, so pointwise long-horizon parity is physically
meaningless; the honest quantitative comparison is *pattern statistics* of
the gas/fluid interface:

  * interface height field  h(z, x): sub-cell y-position of the
    density mid-crossing per vertical column (the spike surface),
  * roughness amplitude     std(h) and peak-to-trough range,
  * dominant wavelength     from the radially-binned 2D FFT power of
    (h - mean): the fastest-growing Rosensweig mode.

Both runs start from the SAME stored perturbed initial condition (so the
linear-growth stage is deterministic and comparable) and are compared at
matching steps on: dominant wavenumber (same FFT bin), amplitude ratio,
and height-field correlation while dynamics remain in the tracked regime.
"""

from __future__ import annotations

import numpy as np


def interface_height(density: np.ndarray, gas: float = 0.02381,
                     fluid: float = 0.2508) -> np.ndarray:
    """Sub-cell y of the last fluid->gas mid-crossing per (z, x) column.

    ``density`` is [z, y, x] (one batch/channel already selected, walls
    included; wall cells hold density_wall=fluid so the crossing search is
    restricted to the interior).
    """
    mid = 0.5 * (gas + fluid)
    d = density[:, 1:-1, :]  # interior in y
    Z, Y, X = d.shape
    above = d >= mid  # fluid side (pool fills low y)
    # last y index where the column is still fluid, scanning from the pool:
    # argmax over reversed 'above' gives the highest fluid cell
    rev = above[:, ::-1, :]
    top_idx = Y - 1 - np.argmax(rev, axis=1)  # [z, x]
    top_idx = np.clip(top_idx, 0, Y - 2)
    d0 = np.take_along_axis(d, top_idx[:, None, :], axis=1)[:, 0, :]
    d1 = np.take_along_axis(d, (top_idx + 1)[:, None, :], axis=1)[:, 0, :]
    frac = np.clip((d0 - mid) / np.maximum(d0 - d1, 1e-12), 0.0, 1.0)
    return top_idx + frac + 1.0  # +1: interior offset back to full grid


def spike_stats(height: np.ndarray) -> dict:
    """Amplitude + dominant-wavenumber statistics of an interface field."""
    h = height - height.mean()
    Z, X = h.shape
    power = np.abs(np.fft.fft2(h)) ** 2
    kz = np.fft.fftfreq(Z)[:, None]
    kx = np.fft.fftfreq(X)[None, :]
    kr = np.sqrt(kz**2 + kx**2)
    # radial binning in units of the fundamental of the longer axis
    n_bins = max(Z, X) // 2
    bins = (kr * max(Z, X)).round().astype(int)
    radial = np.zeros(n_bins)
    for b in range(1, n_bins):
        m = bins == b
        if m.any():
            radial[b] = power[m].sum()
    k_dom = int(np.argmax(radial[1:]) + 1) if radial[1:].any() else 0
    lam = max(Z, X) / k_dom if k_dom else np.inf
    return {
        "amp_std": float(h.std()),
        "amp_range": float(h.max() - h.min()),
        "k_dominant": k_dom,
        "wavelength_cells": float(lam),
        "radial_power": radial,
    }


def compare_runs(ref_den: np.ndarray, our_den: np.ndarray,
                 gas: float = 0.02381, fluid: float = 0.2508) -> dict:
    """Pattern-parity metrics between two density snapshots [z, y, x]."""
    h_ref = interface_height(ref_den, gas, fluid)
    h_our = interface_height(our_den, gas, fluid)
    s_ref = spike_stats(h_ref)
    s_our = spike_stats(h_our)
    a, b = h_ref - h_ref.mean(), h_our - h_our.mean()
    denom = np.sqrt((a * a).sum() * (b * b).sum())
    corr = float((a * b).sum() / denom) if denom > 0 else 1.0
    return {
        "ref": {k: v for k, v in s_ref.items() if k != "radial_power"},
        "ours": {k: v for k, v in s_our.items() if k != "radial_power"},
        "height_correlation": corr,
        "amp_ratio": (s_our["amp_std"] / s_ref["amp_std"]
                      if s_ref["amp_std"] > 0 else np.inf),
        "same_dominant_k": abs(s_ref["k_dominant"] - s_our["k_dominant"]) <= 1,
    }
