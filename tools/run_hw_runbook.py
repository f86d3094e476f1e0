"""Hardware runbook orchestrator (CLAUDE.md round-4 "HARDWARE RUNBOOK").

Runs the post-outage TPU evidence chain sequentially, each phase with
its own wall-clock cap and log file, recording results to
/tmp/arag_runbook/state.json as it goes. Safe to re-run: completed
phases (rc==0) are skipped, so a mid-phase tunnel drop costs only that
phase. Never kills by pattern; every phase is bounded by `timeout`.

Phases (merge A/B is step 0, run separately — its outcome may flip
kernel defaults and therefore must be judged before payload warm-up):
  warm_bench    bench.py with deadline budgets: rebuilds every AOT
                payload incl. the IVF kernel + the QUIRK bf16 Q=32 shape
  default_bench bench.py at default budget: proves the warm path
  serve_suite   tools/run_serve_suite.py incl. dense_reload mid-run
  recall_1m     tools/recall_real.py at 1M rows (production IVF recall)

Run: python tools/run_hw_runbook.py [--phases a,b,...] [--force]
"""
import argparse
import json
import os
import pathlib
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]
STATE_DIR = pathlib.Path("/tmp/arag_runbook")

PHASES = [
    {
        "name": "warm_bench",
        "cmd": [sys.executable, "bench.py"],
        "env": {
            "ARAG_BENCH_DEADLINE": "1",
            "ARAG_BENCH_SKIP_ENCODER": "1",
            "ARAG_BENCH_IVF_BUDGET": "3000",
            "ARAG_BENCH_HARD_DEADLINE": "4000",
        },
        "timeout": 4500,
    },
    {
        "name": "default_bench",
        "cmd": [sys.executable, "bench.py"],
        "env": {},
        "timeout": 2700,
    },
    {
        "name": "serve_suite",
        # VERDICT-mandated modes first (dense/hybrid/rerank re-measure,
        # reload-mid-run); the bonus ivf service mode runs last so its
        # per-Q-bucket fresh compiles + 2M k-means build can't starve
        # them. Suite writes SERVE_r05.json after every mode.
        "cmd": [sys.executable, "tools/run_serve_suite.py", "--round", "5",
                "--modes", "dense,hybrid,rerank256,rerank_cascade,"
                           "dense_reload,ivf"],
        "env": {},
        "timeout": 14500,
    },
    {
        "name": "recall_1m",
        "cmd": [sys.executable, "tools/recall_real.py", "1000000"],
        "env": {},
        "timeout": 10800,
    },
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--phases", default=",".join(p["name"] for p in PHASES))
    ap.add_argument("--force", action="store_true",
                    help="re-run phases even if previously rc==0")
    args = ap.parse_args()
    wanted = set(args.phases.split(","))

    STATE_DIR.mkdir(exist_ok=True)
    state_path = STATE_DIR / "state.json"
    state = {}
    if state_path.exists():
        state = json.loads(state_path.read_text())

    for phase in PHASES:
        name = phase["name"]
        if name not in wanted:
            continue
        prev = state.get(name, {})
        if prev.get("rc") == 0 and not args.force:
            print(f"[runbook] {name}: already done "
                  f"(rc=0 at {prev.get('finished')}), skipping", flush=True)
            continue
        log_path = STATE_DIR / f"{name}.log"
        env = dict(os.environ)
        env.update(phase["env"])
        print(f"[runbook] {name}: starting (timeout {phase['timeout']}s, "
              f"log {log_path})", flush=True)
        t0 = time.perf_counter()
        with open(log_path, "w") as lf:
            try:
                rc = subprocess.run(
                    phase["cmd"], cwd=REPO, env=env, stdout=lf,
                    stderr=subprocess.STDOUT, timeout=phase["timeout"],
                ).returncode
            except subprocess.TimeoutExpired:
                rc = -1
        dt = round(time.perf_counter() - t0, 1)
        state[name] = {
            "rc": rc,
            "seconds": dt,
            "finished": time.strftime("%H:%M:%S"),
            "log": str(log_path),
        }
        state_path.write_text(json.dumps(state, indent=1))
        print(f"[runbook] {name}: rc={rc} in {dt}s", flush=True)
        if rc != 0:
            print(f"[runbook] {name} FAILED — continuing to next phase "
                  f"(tail of log):", flush=True)
            tail = log_path.read_text()[-2000:]
            print(tail, flush=True)
    print(f"[runbook] done: {json.dumps(state)}", flush=True)


if __name__ == "__main__":
    main()
