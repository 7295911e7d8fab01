"""Concatenate multi-phase training JSONLs into one cumulative curve.

The round-5 centerpiece trains in warm-started phases (train_ppo.py
--init-params): each phase's JSONL restarts iteration/env_steps at 0.  This
tool stitches them into a single curve with cumulative ``iteration`` /
``env_steps`` and a ``phase`` tag per record, so the committed curve shows
the full training history end to end.

    python tools/assemble_curve.py out.jsonl A:a.jsonl B:b.jsonl ...
"""
import json
import sys


def main():
    out_path, *phases = sys.argv[1:]
    it_base = steps_base = 0
    out = []
    for spec in phases:
        tag, path = spec.split(":", 1)
        last_it = last_steps = 0
        with open(path) as f:
            for line in f:
                if not line.strip():
                    continue
                r = json.loads(line)
                last_it, last_steps = r["iteration"], r["env_steps"]
                r["phase"] = tag
                r["iteration"] += it_base
                r["env_steps"] += steps_base
                out.append(r)
        it_base += last_it
        steps_base += last_steps
    with open(out_path, "w") as f:
        for r in out:
            f.write(json.dumps(r) + "\n")
    print(f"wrote {len(out)} records ({it_base} iterations, "
          f"{steps_base/1e9:.2f}B env steps) -> {out_path}")


if __name__ == "__main__":
    main()
