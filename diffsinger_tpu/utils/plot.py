"""Matplotlib figure helpers for TensorBoard validation plots.

Capability parity: utils/plot.py (spec_to_figure:8, spec_f0_to_figure:16,
dur_to_figure:30, f0_to_figure:45) — inputs are numpy arrays (no torch)."""

from __future__ import annotations

import numpy as np

LINE_COLORS = ["w", "r", "y", "cyan", "m", "b", "lime"]


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def spec_to_figure(spec: np.ndarray, vmin=None, vmax=None):
    plt = _plt()
    fig = plt.figure(figsize=(12, 6))
    plt.pcolor(np.asarray(spec).T, vmin=vmin, vmax=vmax)
    return fig


def spec_f0_to_figure(spec: np.ndarray, f0s: dict, figsize=None):
    plt = _plt()
    max_y = spec.shape[1]
    fig = plt.figure(figsize=(12, 6) if figsize is None else figsize)
    plt.pcolor(np.asarray(spec).T)
    for i, (k, f0) in enumerate(f0s.items()):
        plt.plot(np.clip(np.asarray(f0) / 10, 0, max_y), label=k,
                 c=LINE_COLORS[i % len(LINE_COLORS)], linewidth=1, alpha=0.8)
    plt.legend()
    return fig


def dur_to_figure(dur_gt: np.ndarray, dur_pred: np.ndarray, txt):
    plt = _plt()
    dur_gt = np.cumsum(np.asarray(dur_gt, np.int64))
    dur_pred = np.cumsum(np.asarray(dur_pred, np.int64))
    fig = plt.figure(figsize=(12, 6))
    for i in range(len(dur_gt)):
        shift = (i % 8) + 1
        plt.text(dur_gt[i], shift, txt[i])
        plt.text(dur_pred[i], 10 + shift, txt[i])
        plt.vlines(dur_gt[i], 0, 10, colors="b")
        plt.vlines(dur_pred[i], 10, 20, colors="r")
    return fig


def f0_to_figure(f0_gt: np.ndarray, f0_cwt=None, f0_pred=None):
    plt = _plt()
    fig = plt.figure()
    plt.plot(np.asarray(f0_gt), color="r", label="gt")
    if f0_cwt is not None:
        plt.plot(np.asarray(f0_cwt), color="b", label="cwt")
    if f0_pred is not None:
        plt.plot(np.asarray(f0_pred), color="green", label="pred")
    plt.legend()
    return fig
