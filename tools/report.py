"""Single source of truth for published performance numbers.

Round-3 review found three surfaces quoting three different values for the
same workload (README.md / docs/scale/bench.md / BENCH_r03.json).  This tool
makes the driver-archived ``BENCH_r<N>.json`` with the highest round number
the only source: it regenerates the marked blocks in ``README.md`` and
``docs/scale/bench.md`` from that JSON, and ``tests/test_report.py`` asserts
the committed files match the regeneration (so a new bench archive without a
re-run of this tool fails the suite).

Usage:
    python tools/report.py            # rewrite the generated blocks in place
    python tools/report.py --check    # exit 1 if any block is out of date

Marked blocks look like::

    <!-- bench-table:begin ... -->
    ...generated content...
    <!-- bench-table:end -->

Everything outside the markers is hand-written prose; everything inside is
owned by this tool.  Benchmark variance context: single-chip run-to-run
spread is ~±10-15% (docs/scale/bench.md), so generated numbers are quoted to
three significant figures.
"""
from __future__ import annotations

import argparse
import json
import re
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def latest_bench(root: Path = ROOT):
    """(round_number, parsed-result dict) of the newest ``BENCH_r*.json``."""
    best_n, best = -1, None
    for p in sorted(root.glob("BENCH_r*.json")):
        m = re.fullmatch(r"BENCH_r(\d+)\.json", p.name)
        if not m:
            continue
        data = json.loads(p.read_text())
        parsed = data.get("parsed")
        if parsed and int(m.group(1)) > best_n:
            best_n, best = int(m.group(1)), parsed
    if best is None:
        raise FileNotFoundError("no BENCH_r*.json with a parsed result found")
    return best_n, best


def local_bench(root: Path, archived_n: int):
    """Parsed result from ``BENCH_local.json`` if it supersedes round ``archived_n``.

    ``bench.py`` drops this file after every full run, recording the highest
    driver archive it saw (``supersedes``).  It wins over that archive — so a
    round can publish its own numbers before the driver archives them — and
    is automatically ignored as soon as a newer ``BENCH_r*.json`` lands.
    Returns the parsed dict, or None when absent/stale.
    """
    p = root / "BENCH_local.json"
    if not p.exists():
        return None
    data = json.loads(p.read_text())
    if data.get("supersedes") != archived_n:
        return None
    return data.get("parsed")


def all_headlines(root: Path = ROOT):
    """Headline value per archived round, ``{round: steps_per_sec}``."""
    out = {}
    for p in sorted(root.glob("BENCH_r*.json")):
        m = re.fullmatch(r"BENCH_r(\d+)\.json", p.name)
        if not m:
            continue
        parsed = json.loads(p.read_text()).get("parsed")
        if parsed:
            out[int(m.group(1))] = parsed["value"]
    return out


def fmt(v) -> str:
    """Three-significant-figure human form: 166555304 -> '167M'."""
    if v is None:
        return "—"
    v = float(v)
    for scale, suffix in ((1e9, "B"), (1e6, "M"), (1e3, "k")):
        if v >= scale:
            x = v / scale
            return (f"{x:.2f}" if x < 10 else f"{x:.1f}" if x < 100 else f"{x:.0f}") + suffix
    return f"{v:.0f}"


def source_label(n: int, is_local: bool) -> str:
    if is_local:
        return f"a local `bench.py` run superseding the round-{n} archive (`BENCH_local.json`"
    return f"the round-{n} archive (`BENCH_r{n:02d}.json`"


def readme_block(n: int, parsed: dict, history: dict, is_local: bool = False) -> str:
    ex = parsed.get("extras", {})
    stat = ex.get("headline_stat", "unlabeled pre-r4 archive (r3 used best-of-2 blocks)")
    rows = [
        "| Workload (`bench.py`) | Throughput | Notes |",
        "|---|---|---|",
        f"| Batched env step (turbo engine, 64k envs, random actions, auto-reset)"
        f" | **{fmt(parsed['value'])} env-steps/s** | {parsed['vs_baseline']:.1f}× the"
        " 50M/host north star (`BASELINE.md` config 2/5) |",
        f"| Obs-fused actor feed (board obs → CNN Q-net fwd → step, 8192 envs)"
        f" | **{fmt(ex.get('actor_steps_per_sec'))} env-steps/s** | replaces the"
        " reference's host-side image pipeline + torch forward (config 3) |",
        f"| Grouped placement enumeration+step (turbo grouped, 4096 envs)"
        f" | **{fmt(ex.get('grouped_placements_per_sec'))} placements/s** features mode"
        f" / **{fmt(ex.get('grouped_boards_placements_per_sec'))}** boards mode"
        " | replaces 40 Python drop simulations per step (config 4);"
        " ~600× the vmapped flagship path |",
        f"| PPO train step (rollout + GAE + minibatch updates, 8192 envs, turbo rollout)"
        f" | **{fmt(ex.get('ppo_env_steps_per_sec'))} env-steps/s trained** | whole"
        " iteration is one XLA program; measured attribution + roofline in"
        " `docs/scale/training_perf.md` |",
        f"| RGB/composite observation pipeline (vmapped Dict obs + fused RGB, 8192 envs)"
        f" | **{fmt(ex.get('rgb_actor_steps_per_sec'))} env-steps/s** | the reference"
        " computes this per env on host (wrappers/observation.py:38-74) |",
    ]
    if "rgb84_chain_steps_per_sec" in ex:
        rows.append(
            "| Reference CNN chain (RGB → 84×84 resize → grayscale → Atari Q-net"
            f" → step, 4096 envs) | **{fmt(ex['rgb84_chain_steps_per_sec'])}"
            " env-steps/s** | the reference's exact preprocessing"
            " (train_cnn.py:127-168) as fused device kernels (ops/image.py) |"
        )
    rows += [
        "",
        f"Numbers are {source_label(n, is_local)}; headline statistic:"
        f" {stat}; run-to-run spread ~±10-15%). Headline history: "
        + ", ".join(f"r{k} {fmt(v)}" for k, v in sorted(history.items()))
        + ".",
    ]
    return "\n".join(rows)


def bench_doc_block(n: int, parsed: dict, is_local: bool = False) -> str:
    ex = parsed.get("extras", {})
    stat = ex.get("headline_stat", "unlabeled pre-r4 archive (r3 used best-of-2 blocks)")
    rows = [
        f"Current numbers (one v5e chip, {source_label(n, is_local)}),"
        f" headline statistic: {stat}):",
        "",
        "| # | Workload | Throughput |",
        "|---|---|---|",
        f"| 1 | Headline: turbo batched step (64k envs × 256 steps × 4 launches,"
        f" random actions, auto-reset) | **{fmt(parsed['value'])} env-steps/s**"
        f" ({parsed['vs_baseline']:.2f}× the 50M north star) |",
        f"| 2 | Actor feed (config 3): board obs → `QNetworkCNN` bf16 forward →"
        f" greedy action → step, 8192 envs | {fmt(ex.get('actor_steps_per_sec'))} steps/s |",
        f"| 3 | Grouped placements (config 4), features mode, 4096 envs |"
        f" {fmt(ex.get('grouped_placements_per_sec'))} placements/s |",
        f"| 4 | Grouped placements, boards mode (per-candidate binary images) |"
        f" {fmt(ex.get('grouped_boards_placements_per_sec'))} placements/s |",
        f"| 5 | PPO train step (rollout + GAE + updates as one program), 8192 envs |"
        f" {fmt(ex.get('ppo_env_steps_per_sec'))} env-steps/s trained |",
        f"| 6 | RGB/composite observation pipeline, 8192 envs |"
        f" {fmt(ex.get('rgb_actor_steps_per_sec'))} steps/s |",
    ]
    if "rgb84_chain_steps_per_sec" in ex:
        rows.append(
            "| 7 | Reference CNN chain: RGB → resize(84×84) → grayscale → Atari"
            " Q-net → step, 4096 envs |"
            f" {fmt(ex['rgb84_chain_steps_per_sec'])} steps/s |"
        )
    return "\n".join(rows)


def splice(path: Path, marker: str, content: str, check: bool) -> bool:
    """Replace the ``<!-- marker:begin -->``..``end`` block; True if changed."""
    text = path.read_text()
    pat = re.compile(
        rf"(<!-- {re.escape(marker)}:begin[^\n]*-->\n).*?(<!-- {re.escape(marker)}:end -->)",
        re.DOTALL,
    )
    if not pat.search(text):
        raise ValueError(f"{path}: marker block '{marker}' not found")
    new = pat.sub(lambda m: m.group(1) + content + "\n" + m.group(2), text)
    changed = new != text
    if changed and not check:
        path.write_text(new)
    return changed


def run(check: bool = False, root: Path = ROOT) -> list:
    n, parsed = latest_bench(root)
    local = local_bench(root, n)
    is_local = local is not None
    if is_local:
        parsed = local
    history = all_headlines(root)
    stale = []
    if splice(
        root / "README.md", "bench-table", readme_block(n, parsed, history, is_local), check
    ):
        stale.append("README.md")
    if splice(
        root / "docs" / "scale" / "bench.md",
        "bench-table",
        bench_doc_block(n, parsed, is_local),
        check,
    ):
        stale.append("docs/scale/bench.md")
    return stale


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--check", action="store_true", help="fail if blocks are stale")
    args = ap.parse_args()
    stale = run(check=args.check)
    if args.check and stale:
        print(f"stale generated blocks (re-run tools/report.py): {stale}", file=sys.stderr)
        sys.exit(1)
    print("updated:" if stale else "up to date:", stale or "all blocks")


if __name__ == "__main__":
    main()
