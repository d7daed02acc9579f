"""Plot the kinematics reconstruction results (UTIS vs HeliOS centroids).

Two figures from ``kinematics_reconstruction_results.json``:
- ``reconstruction_error_distribution.pdf``: histograms + Gaussian KDEs of
  the per-heliostat pointing errors for both centroid-extraction methods.
- ``reconstruction_error_distance.pdf``: pointing error against heliostat
  distance from the tower, with linear trend lines.

reference: examples/paint_plots/reconstruction_plot.py (LaTeX text
rendering is attempted and silently skipped when no TeX toolchain exists).

Usage:
    python reconstruction_plot.py [--config C] [--results_dir R]
        [--plots_dir P] [--number_of_points_to_plot N] [--random_seed S]
"""

from __future__ import annotations

import json
import pathlib
import shutil
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
from _config import load_config  # noqa: E402

UTIS_KEY = "UTIS"
HELIOS_KEY = "HeliOS"
PLOT_COLORS = {HELIOS_KEY: "#1D3557", UTIS_KEY: "#FB8500"}


def _enable_latex_if_available() -> None:
    if shutil.which("latex"):
        plt.rcParams["text.usetex"] = True
        plt.rcParams["text.latex.preamble"] = r"\usepackage{cmbright}"


def plot_error_distribution(results: dict, save_dir: pathlib.Path) -> None:
    """Histogram + KDE of pointing errors per centroid method."""
    helios_losses = np.array([data[HELIOS_KEY] for data in results.values()])
    utis_losses = np.array([data[UTIS_KEY] for data in results.values()])
    x_max = float(max(helios_losses.max(), utis_losses.max()))
    x_values = np.linspace(0.0, x_max, 100)

    try:
        from scipy.stats import gaussian_kde

        kde_helios = gaussian_kde(helios_losses, bw_method="scott")(x_values)
        kde_utis = gaussian_kde(utis_losses, bw_method="scott")(x_values)
    except Exception:  # noqa: BLE001 - scipy optional; histograms suffice
        kde_helios = kde_utis = None

    fig, ax = plt.subplots(figsize=(6, 4))
    # Plot the higher-mean histogram first so the smaller stays visible.
    ordered = sorted(
        [(HELIOS_KEY, helios_losses), (UTIS_KEY, utis_losses)],
        key=lambda item: -item[1].mean(),
    )
    for name, losses in ordered:
        ax.hist(
            losses,
            bins=25,
            range=(0, x_max),
            density=True,
            alpha=0.3,
            label=f"{name} Histogram",
            color=PLOT_COLORS[name],
        )
    for name, losses, kde in (
        (HELIOS_KEY, helios_losses, kde_helios),
        (UTIS_KEY, utis_losses, kde_utis),
    ):
        if kde is not None:
            ax.plot(x_values, kde, label=f"{name} KDE", color=PLOT_COLORS[name])
        ax.axvline(
            losses.mean(),
            color=PLOT_COLORS[name],
            linestyle="--",
            label=f"{name} Mean: {losses.mean():.2f} meter",
        )
    ax.set_xlabel("Pointing Error (meter)")
    ax.set_ylabel("Density")
    ax.grid(True)
    ax.legend(fontsize=8)
    save_path = save_dir / "reconstruction_error_distribution.pdf"
    fig.savefig(save_path, dpi=300, bbox_inches="tight")
    print(f"Saved error-distribution plot to {save_path}")


def plot_error_against_distance(
    results: dict,
    number_of_points_to_plot: int,
    save_dir: pathlib.Path,
    random_seed: int,
) -> None:
    """Pointing error vs heliostat distance from the tower + trend lines."""
    positions = np.array(
        [data["Position"] for data in results.values()], dtype=float
    )
    helios_losses = np.array([data[HELIOS_KEY] for data in results.values()])
    utis_losses = np.array([data[UTIS_KEY] for data in results.values()])
    distances = np.linalg.norm(positions[:, :2], axis=1)

    rng = np.random.RandomState(random_seed)
    if number_of_points_to_plot < distances.shape[0]:
        selected = rng.choice(
            distances.shape[0], number_of_points_to_plot, replace=False
        )
        distances = distances[selected]
        helios_losses = helios_losses[selected]
        utis_losses = utis_losses[selected]

    fig, ax = plt.subplots(figsize=(6, 4))
    ax.scatter(
        distances,
        helios_losses,
        color=PLOT_COLORS[HELIOS_KEY],
        marker="o",
        label="HeliOS Mean Error",
        alpha=0.7,
    )
    ax.scatter(
        distances,
        utis_losses,
        color=PLOT_COLORS[UTIS_KEY],
        marker="^",
        label="UTIS Mean Error",
        alpha=0.7,
    )
    x_values = np.linspace(distances.min(), distances.max(), 200)
    for name, losses in ((HELIOS_KEY, helios_losses), (UTIS_KEY, utis_losses)):
        if distances.shape[0] >= 2:
            trend = np.poly1d(np.polyfit(distances, losses, 1))
            ax.plot(
                x_values,
                trend(x_values),
                color=PLOT_COLORS[name],
                linestyle="--",
                label=f"{name} Trend",
            )
    ax.set_xlabel("Heliostat Distance from Tower (meter)")
    ax.set_ylabel("Mean Pointing Error (meter)")
    ax.grid(True)
    ax.legend(fontsize=8, loc="upper right", ncol=2)
    save_path = save_dir / "reconstruction_error_distance.pdf"
    fig.savefig(save_path, dpi=300, bbox_inches="tight")
    print(f"Saved error-vs-distance plot to {save_path}")


def main() -> None:
    args = load_config(
        ["results_dir", "plots_dir", "number_of_points_to_plot", "random_seed"],
        description=__doc__.splitlines()[0],
    )
    results_path = args.results_dir / "kinematics_reconstruction_results.json"
    if not results_path.exists():
        raise FileNotFoundError(
            f"Reconstruction results at {results_path} not found; run "
            f"reconstruction_generate_results.py first."
        )
    with open(results_path) as f:
        results = json.load(f)
    args.plots_dir.mkdir(parents=True, exist_ok=True)
    _enable_latex_if_available()
    plot_error_distribution(results, args.plots_dir)
    plot_error_against_distance(
        results,
        int(args.number_of_points_to_plot),
        args.plots_dir,
        int(args.random_seed),
    )


if __name__ == "__main__":
    main()
