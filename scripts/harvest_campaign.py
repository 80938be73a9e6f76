"""Summarize a finished (or partial) measurement campaign into BASELINE.md rows.

Reads the artifacts the campaign steps leave behind (/tmp/campaign/*.log,
BENCH_AUX.json, the gate output dirs) and prints a ready-to-paste markdown
table plus a machine-readable JSON line. Safe to run at any point — missing
steps are reported as absent, never crash the harvest.

Usage: python scripts/harvest_campaign.py [--dir /tmp/campaign]
"""
from __future__ import annotations

import argparse
import json
import os
import re


def _last_json_line(path: str) -> dict | None:
    """Last parseable JSON object line in a log (bench/bench_train contract)."""
    try:
        with open(path) as f:
            lines = f.readlines()
    except OSError:
        return None
    for line in reversed(lines):
        line = line.strip()
        if line.startswith("{") and line.endswith("}"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue
    return None


def _read_json(path: str) -> dict | None:
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, json.JSONDecodeError):
        return None


def _grep_last(path: str, pattern: str) -> str | None:
    try:
        with open(path) as f:
            hits = [ln.strip() for ln in f if re.search(pattern, ln)]
        return hits[-1] if hits else None
    except OSError:
        return None


def harvest(cdir: str) -> dict:
    out: dict = {"campaign_dir": cdir}

    bench = _last_json_line(os.path.join(cdir, "bench.log"))
    out["bench"] = bench
    out["bench_aux"] = _read_json("/root/repo/BENCH_AUX.json")

    for name in ("bench_steady", "bench_early"):
        out[name] = _last_json_line(os.path.join(cdir, f"{name}.log"))

    prof = os.path.join(cdir, "profile_train.log")
    out["profile_summary"] = _grep_last(prof, r"ms|Mpix|step")

    # Gates write their own result JSONs into their output dirs
    # (run_material_gate.py:100,187; run_quality_gate.py:159-160,299).
    out["material_gate"] = (
        _read_json("/tmp/gs2m_material/material_gate.json")
        or _last_json_line(os.path.join(cdir, "material_gate.log")))
    out["production_gate"] = (
        _read_json("/tmp/gs2m_production/quality_gate.json")
        or _last_json_line(os.path.join(cdir, "production_gate.log")))

    # End-window artifacts (round 5+: scripts/run_endwindow_r5.sh).
    ew = "/tmp/endwindow5"
    if os.path.isdir(ew):
        for name in ("bt_opaque_base", "bt_opaque_cut", "bt_steady_cut",
                     "bt_early_cut", "bwd_kernel"):
            out[name] = _last_json_line(os.path.join(ew, f"{name}.log"))
        out["material_gate"] = (out.get("material_gate")
                                or _last_json_line(
                                    os.path.join(ew, "material_gate.log")))

    # Campaign control state.
    log = os.path.join(cdir, "campaign.log")
    out["tpu_up"] = os.path.exists(os.path.join(cdir, "TPU_UP"))
    out["done"] = os.path.exists(os.path.join(cdir, "CAMPAIGN_DONE"))
    out["last_log_line"] = _grep_last(log, r".")
    return out


def to_markdown(h: dict) -> str:
    rows = []

    def row(metric, value, config):
        rows.append(f"| {metric} | {value} | {config} |")

    b = h.get("bench")
    if b and b.get("value") is not None:
        row("Rasterizer fwd+bwd throughput",
            f"**{b['value']:.2f} {b.get('unit', 'Mpixel/s')}** "
            f"(vs_baseline {b.get('vs_baseline')}, vs_target {b.get('vs_target')})",
            "1600x1200, 500K Gaussians, pallas (`bench.py`)")
    elif b:
        row("Rasterizer fwd+bwd throughput", f"ERROR: {b.get('error')}", "`bench.py`")

    aux = h.get("bench_aux") or {}
    for k, v in aux.items():
        if isinstance(v, (int, float)):
            row(f"aux: {k}", v, "`bench.py` aux gates (BENCH_AUX.json)")

    for name, cfg in (("bench_steady", "steady-state preset"),
                      ("bench_early", "early-training preset"),
                      ("bt_opaque_base", "opaque preset (term_cut OFF)"),
                      ("bt_opaque_cut", "opaque preset (term_cut ON)"),
                      ("bt_steady_cut", "steady preset (term_cut ON)"),
                      ("bt_early_cut", "early preset (term_cut ON)")):
        t = h.get(name)
        if t:
            val = t.get("projected_30k_min") or t.get("value")
            row(f"Train step ({cfg})",
                f"projected_30k_min={val}, vs_target={t.get('vs_target')}",
                "`bench_train.py`")

    m = h.get("material_gate")
    if m:
        row("Glossy material gate", json.dumps(m)[:160], "`run_material_gate.py`")
    p = h.get("production_gate")
    if p:
        row("Production 30k gate", json.dumps(p)[:300], "`run_quality_gate.py --production`")
    bw = h.get("bwd_kernel")
    if bw:
        row("bwd kernel reversed- vs forward-map", json.dumps(bw)[:160],
            "`microbench_bwd_kernel.py`")

    if not rows:
        return "(no campaign artifacts found yet)"
    return "\n".join(["| Metric | Value | Config |", "|---|---|---|"] + rows)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/campaign")
    args = ap.parse_args()
    h = harvest(args.dir)
    print(to_markdown(h))
    print()
    print(json.dumps(h, default=str))


if __name__ == "__main__":
    main()
