"""Round-4 service-level proof suite -> SERVE_r{N}.json (repo root).

VERDICT r3 weak #6: the service-level numbers lived only in CLAUDE.md
prose from ad-hoc serve_bench runs. This driver runs the recorded
configurations back-to-back on the real TPU and commits one JSON
artifact holding, for every mode, the exact reproduction command and
the full serve_bench result line (including the round-4 per-stage
p50/p95 'stages' field).

Modes (all on the 2M-row int8 index, 16 clients x 24-query requests —
the round-3 load points, so the numbers are directly comparable):
  dense      — int8 fused scan only
  hybrid     — + BM25 alpha=0.7 (now batch-scored natively per window)
  rerank256  — + cross-encoder top-50, 256-token pairs + admission
  rerank512  — A/B: the round-3 512-token-pair configuration

Run: python tools/run_serve_suite.py [--round 4] [--rows 2000000]
     [--modes dense,hybrid,rerank256,rerank512]
Each mode has a wall-clock timeout; a failed/timed-out mode records its
stderr tail instead of killing the suite.
"""
import argparse
import json
import pathlib
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=4)
    ap.add_argument("--rows", type=int, default=2_000_000)
    ap.add_argument("--modes", default="dense,hybrid,rerank256,rerank512")
    ap.add_argument("--timeout", type=float, default=2400.0,
                    help="per-mode wall clock cap (compiles + run)")
    args = ap.parse_args()

    base = [sys.executable, "tools/serve_bench.py", "--rows", str(args.rows),
            "--clients", "16", "--queries-per-client", "8", "--qbatch", "24",
            "--dtype", "int8"]
    modes = {
        "dense": [],
        # service-level IVF route (device-planned, 4096 clusters,
        # nprobe 8): throughput through the full HTTP stack; recall
        # evidence for this config is RECALL_r05
        "ivf": ["--nprobe", "8"],
        "hybrid": ["--hybrid-alpha", "0.7"],
        "rerank256": ["--hybrid-alpha", "0.7", "--rerank",
                      "--rerank-pair-len", "256"],
        # round-5 opt-in cascade A/B vs rerank256: stage-1 64-token pass
        # over all pairs, full-length rescore of the top-20 survivors
        "rerank_cascade": ["--hybrid-alpha", "0.7", "--rerank",
                           "--rerank-pair-len", "256",
                           "--rerank-cascade", "20"],
        "rerank512": ["--hybrid-alpha", "0.7", "--rerank",
                      "--rerank-pair-len", "512",
                      "--rerank-window-pairs", "0"],
        # round-4: zero-downtime /admin/reload fired mid-run under the
        # dense load point — errors must stay 0, reload record reported
        "dense_reload": ["--reload-mid-run"],
    }
    # merge into an existing same-round artifact so separate invocations
    # (e.g. the runbook's core modes, then a manual cascade A/B later)
    # accumulate instead of overwriting each other's results
    out = REPO / f"SERVE_r{args.round:02d}.json"
    suite = {"round": args.round, "rows": args.rows, "results": {}}
    if out.exists():
        try:
            prev = json.loads(out.read_text())
            if prev.get("round") == args.round and prev.get("rows") == args.rows:
                suite["results"].update(prev.get("results", {}))
        except (json.JSONDecodeError, OSError):
            pass
    for name in args.modes.split(","):
        cmd = base + modes[name]
        print(f"[suite] {name}: {' '.join(cmd)}", flush=True)
        t0 = time.perf_counter()
        try:
            r = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True,
                               timeout=args.timeout)
            line = (r.stdout.strip().splitlines() or [""])[-1]
            try:
                parsed = json.loads(line)
            except json.JSONDecodeError:
                parsed = None
            suite["results"][name] = {
                "command": " ".join(cmd),
                "rc": r.returncode,
                "wall_s": round(time.perf_counter() - t0, 1),
                "result": parsed,
                **({} if parsed else {"stderr_tail": r.stderr[-1500:]}),
            }
        except subprocess.TimeoutExpired as exc:
            suite["results"][name] = {
                "command": " ".join(cmd),
                "rc": None,
                "wall_s": round(time.perf_counter() - t0, 1),
                "result": None,
                "stderr_tail": (exc.stderr or b"")[-1500:].decode("utf-8", "replace")
                if isinstance(exc.stderr, bytes) else str(exc.stderr)[-1500:],
            }
        out.write_text(json.dumps(suite, indent=1))
        print(f"[suite] {name} done in "
              f"{suite['results'][name]['wall_s']}s -> {out}", flush=True)


if __name__ == "__main__":
    main()
