"""Run the on-chip TPU lane and record the result as TPULANE_rNN.json.

Round 4's flagship kernel regressed on the real chip while the CPU suite
stayed green, and nothing recorded whether the lane had been run - the
driver records BENCH/MULTICHIP, so this tool gives the lane the same
per-round artifact:

    python tools/run_tpu_lane.py 5        # writes TPULANE_r05.json

Runs ``ARTIST_TEST_TPU=1 pytest -m tpu tests/test_tpu_lane.py`` in a
subprocess (the chip is single-process exclusive - do not run while a
bench holds it), parses the junit XML, and writes per-test outcomes plus
the suite verdict. Exit code mirrors pytest's.
"""

from __future__ import annotations

import json
import os
import pathlib
import subprocess
import sys
import tempfile
import time
import xml.etree.ElementTree as ET

REPO = pathlib.Path(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str]) -> int:
    round_number = int(argv[1]) if len(argv) > 1 else 0
    junit = pathlib.Path(tempfile.mkstemp(suffix=".xml")[1])
    env = dict(os.environ, ARTIST_TEST_TPU="1")
    env.pop("JAX_PLATFORMS", None)
    start = time.time()
    completed = subprocess.run(
        [
            sys.executable,
            "-m",
            "pytest",
            "-m",
            "tpu",
            "tests/test_tpu_lane.py",
            "-q",
            f"--junit-xml={junit}",
        ],
        cwd=REPO,
        env=env,
        timeout=3600,
    )
    record: dict = {
        "round": round_number,
        "returncode": completed.returncode,
        "duration_seconds": round(time.time() - start, 1),
        "git_rev": subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            cwd=REPO,
            capture_output=True,
            text=True,
        ).stdout.strip(),
    }
    try:
        suite = ET.parse(junit).getroot().find("testsuite")
        record["tests"] = int(suite.get("tests", 0))
        record["failures"] = int(suite.get("failures", 0))
        record["errors"] = int(suite.get("errors", 0))
        record["skipped"] = int(suite.get("skipped", 0))
        record["cases"] = {
            case.get("name"): (
                "failed"
                if case.find("failure") is not None
                or case.find("error") is not None
                else ("skipped" if case.find("skipped") is not None else "passed")
            )
            for case in suite.iter("testcase")
        }
    except Exception as error:  # noqa: BLE001 - record what we can
        record["parse_error"] = str(error)
    out = REPO / (
        f"TPULANE_r{round_number:02d}.json" if round_number else "TPULANE.json"
    )
    out.write_text(json.dumps(record, indent=1) + "\n")
    print(f"wrote {out}: {json.dumps(record)[:300]}")
    junit.unlink(missing_ok=True)
    return completed.returncode


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
