#!/usr/bin/env python
"""Same-session old-vs-new bench A/B (VERDICT r9 item 1).

Cross-round bench ratios compare numbers recorded under DIFFERENT box
weather (measured drift 0.7-1.6x between sessions on this box), so a
flagged key's isolated ratio carries up to +-50% environment noise —
both r8 and r9 burned their adjudication budget on exactly this
ambiguity. This tool retires it: extract the PREVIOUS round's code via
``git archive`` into a temp dir, start one Spark worker per variant
(old code / current working tree), and ALTERNATE timed runs of each
key between them in one sitting. Both variants sample the same weather;
``ab_ratio = min_new / min_old`` is like-for-like by construction.

Usage:
    python tools/bench_ab.py [--ref REF] [--reps N] [--sf-dir DIR]
                             [--json] key1 [key2 ...]

``--ref`` defaults to the commit that ADDED the newest BENCH_r{N}.json
— the exact code state the previous round's bench record measured.
``--json`` prints one machine-readable JSON object (bench.py consumes
this); otherwise a human table. Exit 0 unless the harness itself fails
(a per-key ERR is data, not a failure).
"""

from __future__ import annotations

import json
import os
import re
import shutil
import subprocess
import sys
import tempfile

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def prev_round_ref(repo: str = HERE) -> str | None:
    """The commit that ADDED the newest COMMITTED ``BENCH_r{N}.json`` —
    i.e. the code state whose bench record is the baseline current
    numbers are compared against. None if no bench record is committed
    yet.

    Candidates come from ``git ls-files`` (tracked files only), NOT a
    worktree glob: the driver drops each round's BENCH_r{N}.json as an
    UNTRACKED file first, and a glob-selected untracked record has no
    add-commit — which nulled the ref and silently disabled the auto-A/B
    for the whole following round (VERDICT r10 item 1). Tracked
    candidates are tried newest-first, falling back past any record
    whose add-commit git cannot resolve."""
    try:
        tracked = subprocess.run(
            ["git", "ls-files", "BENCH_r*.json"],
            cwd=repo,
            capture_output=True,
            text=True,
            timeout=60,
            check=True,
        ).stdout.split()
    except Exception:
        return None
    cands: list[tuple[int, str]] = []
    for p in tracked:
        m = re.search(r"BENCH_r(\d+)\.json$", p)
        if m:
            cands.append((int(m.group(1)), p))
    for _, name in sorted(cands, reverse=True):
        try:
            out = subprocess.run(
                ["git", "log", "--diff-filter=A", "-1", "--format=%H",
                 "--", name],
                cwd=repo,
                capture_output=True,
                text=True,
                timeout=60,
                check=True,
            ).stdout.strip()
        except Exception:
            continue
        if out:
            return out
    return None


def extract_ref(ref: str, dest: str, repo: str = HERE) -> None:
    """``git archive ref | tar -x`` — read-only on the repo (no worktree
    metadata, no index locks; safe while the driver owns the repo)."""
    os.makedirs(dest, exist_ok=True)
    ar = subprocess.run(
        ["git", "archive", ref],
        cwd=repo,
        capture_output=True,
        timeout=120,
        check=True,
    )
    subprocess.run(
        ["tar", "-x", "-C", dest],
        input=ar.stdout,
        timeout=120,
        check=True,
    )


class _Worker:
    """Line-protocol handle over one bench_ab_worker subprocess."""

    def __init__(self, repo_dir: str, sf_dir: str, label: str):
        self.label = label
        worker = os.path.join(HERE, "tools", "bench_ab_worker.py")
        self.proc = subprocess.Popen(
            [sys.executable, worker, repo_dir, sf_dir],
            stdin=subprocess.PIPE,
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
            text=True,
            cwd=repo_dir,
        )

    def _readline(self) -> str:
        line = self.proc.stdout.readline()
        if not line:
            raise RuntimeError(f"{self.label} worker died")
        return line.strip()

    def wait_ready(self) -> None:
        while True:
            line = self._readline()
            if line == "READY":
                return

    def send(self, cmd: str) -> list[str]:
        self.proc.stdin.write(cmd + "\n")
        self.proc.stdin.flush()
        # the JVM child shares the worker's stdout pipe — skip any
        # non-protocol line (stray log output) instead of desyncing
        while True:
            parts = self._readline().split()
            if parts and parts[0] in ("OK", "ERR"):
                return parts

    def close(self) -> None:
        try:
            self.proc.stdin.write("QUIT\n")
            self.proc.stdin.flush()
        except Exception:
            pass
        try:
            self.proc.wait(timeout=60)
        except Exception:
            self.proc.kill()


def drive(old: _Worker, new: _Worker, keys: list[str], reps: int = 3) -> dict:
    """Alternate timed runs between the two live workers. Per rep the
    variant order flips (old-first on even reps, new-first on odd), so
    a linear weather drift within the sitting cancels instead of biasing
    one variant. Per-key result: min over reps for each variant, plus
    the ratio; a variant erroring on a key yields an ``ab_err`` row
    (e.g. a key that does not exist in the old code). A key that errors
    mid-sitting stops being run on EITHER side — its ratio is already
    unusable, so further reps would be wasted double executions."""
    if reps < 1:
        raise ValueError(f"reps must be >= 1, got {reps}")
    results: dict[str, dict] = {}
    runnable: list[str] = []
    for key in keys:
        ok_old = old.send(f"WARM {key}")[0] == "OK"
        ok_new = new.send(f"WARM {key}")[0] == "OK"
        if ok_old and ok_new:
            runnable.append(key)
        else:
            which = [] if ok_old else ["old"]
            which += [] if ok_new else ["new"]
            results[key] = {"ab_err": f"warm_failed:{'+'.join(which)}"}
    times: dict[str, dict[str, list[float]]] = {
        k: {"old": [], "new": []} for k in runnable
    }
    for rep in range(reps):
        order = (old, new) if rep % 2 == 0 else (new, old)
        for key in runnable:
            if "ab_err" in results.get(key, {}):
                continue  # failed earlier this sitting — don't re-run
            for w in order:
                reply = w.send(f"RUN {key}")
                side = "old" if w is old else "new"
                if reply[0] == "OK" and len(reply) >= 3:
                    times[key][side].append(float(reply[2]))
                else:
                    results.setdefault(key, {})["ab_err"] = (
                        f"run_failed:{side}"
                    )
                    break
    for key in runnable:
        if key in results and "ab_err" in results[key]:
            continue
        o, n = min(times[key]["old"]), min(times[key]["new"])
        results[key] = {
            "ab_old_sec": round(o, 3),
            "ab_new_sec": round(n, 3),
            "ab_ratio": round(n / o, 2) if o > 0 else None,
        }
    return results


def ab_compare(
    keys: list[str],
    ref: str | None = None,
    sf_dir: str | None = None,
    reps: int = 3,
) -> dict:
    """End-to-end A/B: archive ``ref`` (default: previous round's bench
    commit), spawn both workers, alternate, clean up. Returns
    {key: {ab_old_sec, ab_new_sec, ab_ratio} | {ab_err}} plus the
    resolved ref under the ``_ref`` pseudo-key."""
    sf_dir = sf_dir or os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    ref = ref or prev_round_ref()
    if ref is None:
        return {"_ref": None, "_err": "no_previous_bench_commit"}
    old_dir = tempfile.mkdtemp(prefix=f"fdis_{os.getpid()}_abold_")
    old = new = None
    try:
        extract_ref(ref, old_dir)
        old = _Worker(old_dir, sf_dir, "old")
        new = _Worker(HERE, sf_dir, "new")
        old.wait_ready()
        new.wait_ready()
        results = drive(old, new, keys, reps=reps)
        results["_ref"] = ref
        return results
    finally:
        for w in (old, new):
            if w is not None:
                w.close()
        shutil.rmtree(old_dir, ignore_errors=True)


def main() -> int:
    args = sys.argv[1:]
    ref = None
    reps = 3
    sf_dir = None
    as_json = False
    keys: list[str] = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--ref":
            ref, i = args[i + 1], i + 2
        elif a == "--reps":
            reps, i = int(args[i + 1]), i + 2
        elif a == "--sf-dir":
            sf_dir, i = args[i + 1], i + 2
        elif a == "--json":
            as_json, i = True, i + 1
        else:
            keys.append(a)
            i += 1
    if not keys or reps < 1:
        print("usage: bench_ab.py [--ref R] [--reps N>=1] [--sf-dir D] "
              "[--json] key...", file=sys.stderr)
        return 2
    results = ab_compare(keys, ref=ref, sf_dir=sf_dir, reps=reps)
    if as_json:
        print(json.dumps(results, sort_keys=True))
        return 0
    ref_used = results.pop("_ref", None)
    print(f"A/B vs {ref_used}:")
    for key in keys:
        row = results.get(key, {})
        if "ab_ratio" in row:
            print(
                f"  {key}: old {row['ab_old_sec']}s new {row['ab_new_sec']}s"
                f" ratio {row['ab_ratio']}"
            )
        else:
            print(f"  {key}: {row.get('ab_err', 'no result')}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
