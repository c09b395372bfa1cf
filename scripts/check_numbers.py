#!/usr/bin/env python
"""Mechanical consistency check: docs vs committed benchmark artifacts.

Rounds 2-4 each shipped a "number drift" verdict finding (README or
docs/modes.md quoting a throughput figure that matched no committed
artifact). This script closes the class: it parses the NEWEST committed
artifacts (BENCH_r{N}.json / BENCH_ALL_r{N}.json, NEWMODES_r{N}.json)
and asserts every artifact-backed figure quoted in README.md and
docs/modes.md matches them. It runs in the fast test lane
(tests/test_number_consistency.py), so a stale quote fails CI the
moment either side changes.

Exit 0 = consistent; exit 1 = prints every mismatch.

Policy for doc authors: quote headline numbers as the artifact value
rounded to 2 significant decimals (e.g. 11.78M from 11781946.9); per-
mode rates as the NEWMODES mrays_per_s rounded to 2 decimals. Never
quote a number without a committed artifact behind it.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# docs/modes.md row label -> NEWMODES mode key(s). Each entry checks
# every "<float> M[rays/s]" figure in that row against the artifact
# values (order-insensitive, 2% or 0.02 absolute tolerance).
MODES_TABLE_MAP = {
    "Magnification map": ["magnification map"],
    "Source-plane caustics": ["caustics 128-bin"],
    "Microlensing curve": ["microlens x41"],
    "Time-delay (Fermat) map": ["time-delay map"],
    "Weak-lensing": ["shear decomposition"],
    "Photon-ring decomposition (disk": ["disk decomposed x3"],
    "Polarized disk": ["polarized disk"],
    "Volumetric thin / jet / absorbed": [
        "volumetric thin", "volumetric jet b=0.6", "volumetric absorbed"],
    "Spectral 3-band": ["spectral 3-band"],
    "Flare movie (8-frame)": ["movie 8-frame"],
    "Polarized volumetric": ["polarized"],
    "Volumetric ring decomposition": ["decomposed x3"],
    "Star image / pulse": ["star image", "star pulse x32"],
    "Kerr-Newman trace": ["kerr-newman trace"],
    "Custom-metric (autodiff RHS) trace": ["custom-metric trace"],
    "Johannsen-Psaltis trace": ["johannsen-psaltis trace"],
}


def _newest(pattern):
    """Newest artifact by round number (BENCH_r4 < BENCH_r10)."""
    best, best_n = None, -1
    for path in glob.glob(os.path.join(ROOT, pattern)):
        m = re.search(r"_r(\d+)\.json", path)
        n = int(m.group(1)) if m else -1
        if n > best_n:
            best, best_n = path, n
    return best


def _lines(path):
    """Rows of an artifact: driver-wrapped BENCH_r{N}.json (one object
    with the measured line under "parsed") or plain JSONL
    (BENCH_ALL/NEWMODES)."""
    text = open(path).read().strip()
    if text.startswith("{\n"):
        doc = json.loads(text)
        return [doc["parsed"]] if doc.get("parsed") else []
    return [json.loads(line) for line in text.splitlines() if line.strip()]


def check(errors):
    # --- headline: README vs the newest BENCH artifact ---
    bench_path = _newest("BENCH_r*.json")
    bench_all_path = _newest("BENCH_ALL_r*.json")
    headline = None
    for path in (bench_all_path, bench_path):   # BENCH_ALL wins ties
        if path is None:
            continue
        for row in _lines(path):
            metric = row.get("metric", "")
            if (metric.startswith("kerr_a")
                    and "shadow_1024sq_rays_per_sec_chip" in metric):
                headline = (row, os.path.basename(path))
        if headline:
            break
    readme = open(os.path.join(ROOT, "README.md")).read()
    m = re.search(r"Measured: ([\d.]+)M rays/s", readme)
    if headline is None:
        errors.append("no BENCH_r*.json headline artifact found")
    elif m is None:
        errors.append("README.md has no 'Measured: X.XXM rays/s' headline")
    else:
        row, src = headline
        want = row["value"] / 1e6
        got = float(m.group(1))
        if abs(got - want) > 0.05:
            errors.append(
                f"README headline {got}M != {want:.2f}M ({src})")
        mx = re.search(r"([\d,]+)× the CPU\s+reference", readme)
        if mx and "vs_baseline" in row:
            got_x = float(mx.group(1).replace(",", ""))
            if abs(got_x - row["vs_baseline"]) > 0.02 * row["vs_baseline"]:
                errors.append(
                    f"README CPU-reference multiplier {got_x}x != "
                    f"{row['vs_baseline']}x ({src})")

    # --- per-mode table: docs/modes.md vs the newest NEWMODES ---
    nm_path = _newest("NEWMODES_r*.json")
    if nm_path is None:
        errors.append("no NEWMODES_r*.json artifact found")
        return
    rates = {}
    for row in _lines(nm_path):
        rates[row["mode"]] = row["mrays_per_s"]
    modes_md = open(os.path.join(ROOT, "docs", "modes.md")).read()
    nm_base = os.path.basename(nm_path)
    if nm_base not in modes_md:
        errors.append(f"docs/modes.md does not cite {nm_base} "
                      "(stale artifact reference)")
    # Only the measured-throughput table quotes figures; the mode/CLI
    # table above it reuses several row labels without numbers.
    marker = "## Measured chip throughput per mode"
    if marker in modes_md:
        modes_md = modes_md.split(marker, 1)[1]
    else:
        errors.append(f"docs/modes.md lost the '{marker}' section")
    for label, keys in MODES_TABLE_MAP.items():
        row_m = re.search(
            re.escape(label) + r"[^|\n]*\|([^|\n]*)\|?", modes_md)
        if row_m is None:
            errors.append(f"docs/modes.md: row '{label}' not found")
            continue
        cell = row_m.group(1)
        quoted = [float(v) for v in re.findall(
            r"(\d+\.\d+)\s*(?:/|M)", cell)]
        want = [rates[k] for k in keys if k in rates]
        if len(want) != len(keys):
            missing = [k for k in keys if k not in rates]
            errors.append(f"{nm_base}: missing mode rows {missing}")
            continue
        if len(quoted) < len(want):
            errors.append(
                f"docs/modes.md '{label}': found {len(quoted)} figures "
                f"{quoted}, expected {len(want)} ({want})")
            continue
        for w in want:
            ok = any(abs(q - w) <= max(0.02, 0.02 * w) for q in quoted)
            if not ok:
                errors.append(
                    f"docs/modes.md '{label}': no quoted figure in "
                    f"{quoted} matches artifact {w} ({nm_base})")


def main():
    errors = []
    check(errors)
    if errors:
        for e in errors:
            print(f"MISMATCH: {e}")
        return 1
    print("all doc figures match the committed artifacts")
    return 0


if __name__ == "__main__":
    sys.exit(main())
