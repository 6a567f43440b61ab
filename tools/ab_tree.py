"""A/B bench entries across two CHECKOUTS (e.g. git-HEAD vs working
tree), interleaved (A,B,A,B) to cancel host drift.  Both arms run the
SAME bench.py (the one in dir B) so the timing methodology is identical
and only the library code differs.

Usage:
  python tools/ab_tree.py DIR_A DIR_B entry [entry ...] [--repeat N]

Each arm runs its checkout's own `bench.py --entry <name>` as a child
JVM (copy dir B's bench.py into dir A first so the timing methodology
is identical); prints per-entry min-of-reps and the ratio B/A.
"""
import json
import os
import subprocess
import sys


def run_child(tree, name):
    env = dict(os.environ)
    env["PYTHONPATH"] = tree
    p = subprocess.run(
        [sys.executable, os.path.join(tree, "bench.py"), "--entry", name,
         "--repeat", "2", "--warmup", "1"],
        capture_output=True, text=True, env=env, cwd=tree)
    line = (p.stdout.strip().splitlines() or ["{}"])[-1]
    try:
        return float(json.loads(line)["sec"])
    except (ValueError, KeyError, json.JSONDecodeError):
        print(p.stderr[-1500:], file=sys.stderr)
        return None


def main():
    args = sys.argv[1:]
    reps = 2
    if "--repeat" in args:
        i = args.index("--repeat")
        reps = int(args[i + 1])
        args = args[:i] + args[i + 2:]
    dir_a, dir_b = os.path.abspath(args[0]), os.path.abspath(args[1])
    entries = args[2:]
    for name in entries:
        a_times, b_times = [], []
        for _ in range(reps):
            ta = run_child(dir_a, name)
            tb = run_child(dir_b, name)
            if ta is not None:
                a_times.append(ta)
            if tb is not None:
                b_times.append(tb)
        if not a_times or not b_times:
            print(f"{name}: FAILED")
            continue
        ma, mb = min(a_times), min(b_times)
        print(f"{name}: A={ma:.2f} {a_times}  B={mb:.2f} {b_times}  "
              f"B/A={mb/ma:.2f}", flush=True)


if __name__ == "__main__":
    main()
