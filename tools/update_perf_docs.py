"""Regenerate the measured-performance tables in docs from a bench JSON.

Usage:
    python tools/update_perf_docs.py [BENCH_rNN.json]

Reads the given bench result (default: the highest-numbered BENCH_r*.json
in the repo root), renders the headline table with BOTH absolute and
hardware-normalized figures plus the run's chip calibration, and rewrites
the marked sections of docs/performance.md and README.md in place.

Why: absolute rays/s through a tunneled/virtualized TPU drifts with the
chip allocation (a 24x calibration swing was recorded between two rounds
with identical code), so every absolute number is documented WITH the
same-run ``measured_matmul_tflops`` and the normalized
rays-per-measured-TFLOP figure that stays comparable across runs.
"""

from __future__ import annotations

import json
import os
import pathlib
import re
import sys

REPO = pathlib.Path(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
BEGIN, END = "<!-- BENCH_TABLE:BEGIN -->", "<!-- BENCH_TABLE:END -->"


def _load_bench(argv: list[str]) -> tuple[dict, str]:
    if len(argv) > 1:
        path = pathlib.Path(argv[1])
    else:
        candidates = sorted(REPO.glob("BENCH_r*.json"))
        if not candidates:
            raise SystemExit("no BENCH_r*.json found and no path given")
        path = candidates[-1]
    with open(path) as handle:
        record = json.load(handle)
    # Driver records wrap the JSON line in a {"tail": ...} envelope.
    if "tail" in record:
        for line in reversed(record["tail"].strip().splitlines()):
            line = line.strip()
            if line.startswith("{") and "rays_per_second" in line:
                return json.loads(line), path.name
        raise SystemExit(f"{path} has no bench JSON line in its tail")
    return record, path.name


def _fmt_m(value: float | None) -> str:
    return "—" if not value else f"{value / 1e6:.1f}M"


def _fmt_k(value: float | None) -> str:
    return "—" if not value else f"{value / 1e3:.0f}k"


def render_table(bench: dict, source: str) -> str:
    large = bench.get("large_field", {})
    tflops = bench.get("measured_matmul_tflops")

    def norm(container: dict, value_key: str, norm_key: str) -> float | None:
        if container.get(norm_key):
            return container[norm_key]
        if tflops and container.get(value_key):
            return container[value_key] / tflops
        return None

    rows = [
        (
            "fwd+bwd render (differentiable step)",
            bench.get("value"),
            norm(bench, "value", "rays_per_measured_matmul_tflop"),
        ),
        (
            "fwd+bwd with field-wide blocking ON",
            bench.get("blocking_rays_per_second"),
            norm(
                bench,
                "blocking_rays_per_second",
                "blocking_rays_per_measured_matmul_tflop",
            ),
        ),
        (
            f"{large.get('heliostats', '—')}-heliostat field "
            f"({large.get('rays_per_point', '—')} rays/point)",
            large.get("rays_per_second"),
            norm(
                large,
                "rays_per_second",
                "rays_per_second_per_measured_matmul_tflop",
            ),
        ),
        (
            f"{large.get('heliostats', '—')}-heliostat field, blocking ON",
            large.get("blocking_rays_per_second"),
            norm(
                large,
                "blocking_rays_per_second",
                "blocking_rays_per_second_per_measured_matmul_tflop",
            ),
        ),
    ]
    xl = bench.get("xl_field", {})
    if xl.get("rays_per_second"):
        rows.append(
            (
                f"{xl.get('heliostats', '—')}-heliostat plant "
                f"({xl.get('rays_per_point', '—')} rays/point)",
                xl.get("rays_per_second"),
                norm(
                    xl,
                    "rays_per_second",
                    "rays_per_second_per_measured_matmul_tflop",
                ),
            )
        )
        if xl.get("blocking_rays_per_second"):
            rows.append(
                (
                    f"{xl.get('heliostats', '—')}-heliostat plant, blocking ON",
                    xl.get("blocking_rays_per_second"),
                    norm(
                        xl,
                        "blocking_rays_per_second",
                        "blocking_rays_per_second_per_measured_matmul_tflop",
                    ),
                )
            )
    lines = [
        BEGIN,
        f"Source: `{source}` on `{bench.get('device', 'unknown device')}`; chip "
        f"calibration for that run: **measured matmul peak "
        f"{tflops if tflops else '—'} TFLOP/s** "
        f"(`measured_matmul_tflops`, dispatch-corrected slope calibration). "
        "Absolute rays/s scales with this calibration (tunnel/allocation "
        "drift of 20x+ between runs has been recorded with identical code); "
        "the normalized column is the cross-run-comparable figure.",
        "",
        "| Configuration | Throughput | rays/s per measured TFLOP/s |",
        "|---|---|---|",
    ]
    for label, absolute, normalized_value in rows:
        lines.append(
            f"| {label} | {_fmt_m(absolute)} rays/s | {_fmt_k(normalized_value)} |"
        )
    if bench.get("vs_baseline"):
        lines.append(
            f"| torch reference, same physics, host CPU | "
            f"{bench['vs_baseline']}x slower per ray | — |"
        )
    if bench.get("mfu_vs_measured_peak"):
        lines.append("")
        lines.append(
            f"The step runs at {bench['mfu_vs_measured_peak']:.2f} of the "
            "device's measured matmul peak (`mfu_vs_measured_peak`)."
        )
    aim = bench.get("aim_point_optimization", {})
    if aim.get("epochs_per_hour"):
        lines.append("")
        lines.append(
            f"Aim-point optimization (flagship field, "
            f"{aim.get('rays_per_point')} rays/point, blocking "
            f"{aim.get('blocking')}): **{aim['epochs_per_hour']:.0f} "
            f"epochs/hour** ({aim.get('seconds_per_epoch')} s/epoch)."
        )
    recon = bench.get("surface_reconstruction", {})
    if recon.get("epochs_per_hour"):
        lines.append("")
        lines.append(
            f"Optimizer-level: surface reconstruction at the reference's "
            f"production configuration (batch {recon.get('batch_size')}, "
            f"{recon.get('rays_per_point')} rays/point, "
            f"{recon.get('surface_points', ['—'])[0]}x"
            f"{recon.get('surface_points', ['—', '—'])[1]} points/facet) runs "
            f"**{recon['epochs_per_hour']:.0f} epochs/hour** "
            f"({recon.get('seconds_per_epoch')} s/epoch; the reference's "
            f"300-epoch campaign ≈ "
            f"{recon.get('production_300_epochs_minutes')} min)."
        )
    lines.append(END)
    return "\n".join(lines)


def splice(path: pathlib.Path, table: str) -> bool:
    text = path.read_text()
    pattern = re.compile(re.escape(BEGIN) + r".*?" + re.escape(END), re.DOTALL)
    if not pattern.search(text):
        return False
    path.write_text(pattern.sub(lambda _: table, text))
    return True


def main(argv: list[str]) -> None:
    bench, source = _load_bench(argv)
    table = render_table(bench, source)
    for name in ("docs/performance.md", "README.md"):
        if splice(REPO / name, table):
            print(f"updated {name}")
        else:
            print(f"no {BEGIN} marker in {name}; skipped")


if __name__ == "__main__":
    main(sys.argv)
