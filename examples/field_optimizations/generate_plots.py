"""Plot the field-optimization results produced by ``generate_results.py``.

reference: examples/field_optimizations/generate_plots.py (1333 LoC). This
build renders (a) loss curves for each optimization and (b) the flux image
of the optimized field before/after surface reconstruction.

Usage:
    python examples/field_optimizations/generate_plots.py [config.yaml]
"""

from __future__ import annotations

import pathlib as _pathlib
import sys as _sys

_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parents[2]))

import json
import pathlib
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from generate_scenarios import load_config


def plot_loss_histories(results_dir: pathlib.Path, plots_dir: pathlib.Path) -> None:
    files = {
        "surface reconstruction": results_dir / "surface_loss_history.json",
        "kinematics reconstruction": results_dir / "kinematics_loss_history.json",
        "aim-point optimization": results_dir / "aim_point_loss_history.json",
    }
    present = {k: v for k, v in files.items() if v.exists()}
    if not present:
        return
    fig, axes = plt.subplots(1, len(present), figsize=(5 * len(present), 4))
    axes = np.atleast_1d(axes)
    for ax, (title, path) in zip(axes, present.items()):
        with open(path) as handle:
            histories = json.load(handle)
        for key, values in histories.items():
            if isinstance(values, dict):
                for sub_key, sub_values in values.items():
                    ax.plot(sub_values, label=f"{key}/{sub_key}")
            else:
                ax.plot(values, label=key)
        ax.set_title(title)
        ax.set_xlabel("epoch")
        ax.set_ylabel("loss")
        ax.set_yscale("log")
        ax.legend(fontsize=7)
    fig.tight_layout()
    fig.savefig(plots_dir / "loss_histories.png", dpi=150)
    plt.close(fig)


def plot_flux(results_dir: pathlib.Path, plots_dir: pathlib.Path) -> None:
    path = results_dir / "final_flux.npz"
    if not path.exists():
        return
    data = np.load(path)
    names = list(data.keys())
    fig, axes = plt.subplots(1, len(names), figsize=(4 * len(names), 4))
    axes = np.atleast_1d(axes)
    for ax, name in zip(axes, names):
        im = ax.imshow(data[name], cmap="inferno")
        ax.set_title(name)
        fig.colorbar(im, ax=ax, shrink=0.8)
    fig.tight_layout()
    fig.savefig(plots_dir / "flux.png", dpi=150)
    plt.close(fig)


def main() -> None:
    config = load_config(sys.argv)
    results_dir = pathlib.Path(config["results_dir"])
    plots_dir = pathlib.Path(config["plots_dir"])
    plots_dir.mkdir(parents=True, exist_ok=True)
    plot_loss_histories(results_dir, plots_dir)
    plot_flux(results_dir, plots_dir)
    print(f"plots written to {plots_dir}")


if __name__ == "__main__":
    main()
