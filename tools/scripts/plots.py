#!/usr/bin/env python
"""Paper-figure plotting utilities (reference scripts/plots.py): the
motivation bar chart comparing RegionCLIP- vs ImageNet-initialized AP on the
artistic target domains. Headless-safe (Agg backend)."""

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np


def draw_motivation_barchart(out_path="motivation.png"):
    datasets = ["CLIPART", "COMIC", "WATERCOLOR"]
    models = ["RegionCLIP", "ImageNet"]
    performance = np.array([[90, 70], [80, 60], [85, 75]], float)
    colors = {"RegionCLIP": "tab:blue", "ImageNet": "lightblue"}

    fig, ax = plt.subplots(figsize=(5, 3))
    x = np.arange(len(datasets))
    width = 0.35
    for j, model in enumerate(models):
        ax.bar(x + j * width, performance[:, j], width, label=model, color=colors[model])
    ax.set_xticks(x + width / 2)
    ax.set_xticklabels(datasets)
    ax.set_ylabel("AP50")
    ax.legend(frameon=False)
    fig.tight_layout()
    fig.savefig(out_path, dpi=150)
    return out_path


if __name__ == "__main__":
    print(draw_motivation_barchart())
