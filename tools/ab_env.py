"""A/B a bench env knob per entry, interleaved (A,B,A,B) to cancel host
drift.  Usage:

  python tools/ab_env.py VAR valueA valueB entry [entry ...] [--repeat N]

Each arm runs `bench.py --entry <name>` in its own child JVM with VAR set;
prints per-entry min-of-reps for both arms and the ratio B/A.
"""
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_child(name, env):
    p = subprocess.run(
        [sys.executable, os.path.join(HERE, "bench.py"), "--entry", name,
         "--repeat", "1", "--warmup", "1"],
        capture_output=True, text=True, env=env)
    line = (p.stdout.strip().splitlines() or ["{}"])[-1]
    try:
        return float(json.loads(line)["sec"])
    except (ValueError, KeyError, json.JSONDecodeError):
        print(p.stderr[-1500:], file=sys.stderr)
        return None


def main():
    args = sys.argv[1:]
    reps = 3
    if "--repeat" in args:
        i = args.index("--repeat")
        reps = int(args[i + 1])
        args = args[:i] + args[i + 2:]
    var, va, vb = args[0], args[1], args[2]
    entries = args[3:]
    base = dict(os.environ)
    env_a = dict(base, **{var: va})
    env_b = dict(base, **{var: vb})
    for name in entries:
        a_times, b_times = [], []
        for _ in range(reps):
            ta = run_child(name, env_a)
            tb = run_child(name, env_b)
            if ta is not None:
                a_times.append(ta)
            if tb is not None:
                b_times.append(tb)
        if not a_times or not b_times:
            print(f"{name}: FAILED")
            continue
        ma, mb = min(a_times), min(b_times)
        print(f"{name}: A({va})={ma:.2f} {a_times}  "
              f"B({vb})={mb:.2f} {b_times}  B/A={mb/ma:.2f}", flush=True)


if __name__ == "__main__":
    main()
