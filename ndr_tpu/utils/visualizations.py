"""Plotting utilities (reference: visualizations.py).

Matplotlib-only (no cv2/pandas dependencies): loss curves, density
images, prediction-vs-ground-truth panels, and sigma-sweep image grids.
"""

from __future__ import annotations

import glob
import os
import re
from datetime import datetime
from typing import List, Optional, Sequence

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402


def _unique_title(path: str, title: str, ext: str = ".png") -> str:
    if os.path.isfile(os.path.join(path, title + ext)):
        title += str(int(datetime.timestamp(datetime.now())))
    return title


def loss_vis(compliance_loss_array, title, save=True, path="tmp/", ylim=None):
    """Compliance-vs-iteration curve (reference: visualizations.py:33-52)."""
    os.makedirs(path, exist_ok=True)
    title_ = _unique_title(path, title)
    if save:
        ylim = ylim if ylim is not None else 5000.0
        plt.rcParams.update({"font.size": 18})
        plt.figure(figsize=(14, 10))
        xs = np.arange(len(compliance_loss_array))
        plt.plot(xs, compliance_loss_array, label="compliance loss")
        plt.title("Compliance")
        plt.xlabel("Iteration")
        plt.ylabel("Compliance Loss")
        plt.ylim(0, ylim)
        plt.suptitle(title, fontsize=18)
        plt.savefig(os.path.join(path, title_ + ".png"))
        plt.close()
    return title_


def density_vis(density, loss, title, save=True, binary_loss=None, path="tmp/"):
    """2-D density image with compliance in the caption
    (reference: visualizations.py:54-103)."""
    os.makedirs(path, exist_ok=True)
    density = np.asarray(density)
    title_ = _unique_title(path, title)
    if save:
        plt.rcParams.update({"font.size": 18})
        h, w = density.shape
        plt.figure(figsize=(12, max(4, 12 * w / h)))
        plt.imshow(-density.T, cmap="gray", origin="lower")
        caption = f"compliance {float(loss):.4f}"
        if binary_loss is not None:
            caption += f" | binary {float(binary_loss):.4f}"
        plt.title(caption)
        plt.axis("off")
        plt.suptitle(title, fontsize=16)
        plt.savefig(os.path.join(path, title_ + ".png"), bbox_inches="tight")
        plt.close()
    return title_


def pred_gt_density_vis(pred, gt, pred_loss, gt_loss, title, save=True, path="tmp/"):
    """Side-by-side prediction / ground-truth density panels
    (reference: visualizations.py:106-124)."""
    os.makedirs(path, exist_ok=True)
    title_ = _unique_title(path, title)
    if save:
        fig, axes = plt.subplots(2, 1, figsize=(12, 10))
        for ax, (img, loss, name) in zip(
            axes,
            [(pred, pred_loss, "prediction"), (gt, gt_loss, "ground truth")],
        ):
            ax.imshow(-np.asarray(img).T, cmap="gray", origin="lower")
            ax.set_title(f"{name}: compliance {float(loss):.4f}")
            ax.axis("off")
        fig.suptitle(title)
        fig.savefig(os.path.join(path, title_ + ".png"), bbox_inches="tight")
        plt.close(fig)
    return title_


def _scale_key(path: str) -> float:
    """Sort key extracting the sigma scale from filenames like
    '..._s[2.5]_...' (reference: visualizations.py:137-150)."""
    m = re.search(r"_s\[?([0-9.]+)\]?", os.path.basename(path))
    return float(m.group(1)) if m else 0.0


def n_column_image_grid(title, image_list: Optional[List[str]] = None,
                        path="tmp/", patterns: Optional[Sequence[str]] = None,
                        n_cols: int = 3):
    """Grid of saved density images sorted by their sigma scale
    (reference: visualizations.py:127-177)."""
    if image_list is None:
        image_list = []
        for pat in patterns or []:
            image_list += glob.glob(pat)
    image_list = sorted(image_list, key=_scale_key)
    if not image_list:
        return None
    n = len(image_list)
    n_rows = -(-n // n_cols)
    fig, axes = plt.subplots(n_rows, n_cols, figsize=(6 * n_cols, 4 * n_rows))
    axes = np.atleast_1d(axes).ravel()
    for ax in axes:
        ax.axis("off")
    for ax, img_path in zip(axes, image_list):
        ax.imshow(plt.imread(img_path))
        ax.set_title(os.path.basename(img_path), fontsize=8)
    fig.suptitle(title)
    out = os.path.join(path, title + "_grid.png")
    fig.savefig(out, bbox_inches="tight")
    plt.close(fig)
    return out


def memory_usage_vis(csv_file, names=None):
    """Bar chart of memory consumption per grid size from a CSV log
    (reference: visualizations.py:20-30; pandas-free)."""
    import csv as _csv

    names = names or ["Dimensions", "CPU-Mem", "GPU-Mem"]
    rows = list(_csv.reader(open(csv_file)))
    labels = [r[0] for r in rows]
    series = list(zip(*[[float(v) for v in r[1:]] for r in rows]))
    fig, ax = plt.subplots(figsize=(11, 4))
    width = 0.8 / max(len(series), 1)
    xs = np.arange(len(labels))
    for i, vals in enumerate(series):
        ax.bar(xs + i * width, vals, width, label=names[i + 1] if i + 1 < len(names) else f"s{i}")
    ax.set_xticks(xs + width * (len(series) - 1) / 2)
    ax.set_xticklabels(labels)
    ax.set_title("Memory Consumption")
    ax.set_xlabel(names[0])
    ax.set_ylabel("Memory (MB)")
    ax.legend()
    out = csv_file[:-3] + "jpg" if csv_file.endswith(".csv") else csv_file + ".jpg"
    fig.savefig(out)
    plt.close(fig)
    return out
