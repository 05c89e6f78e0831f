#!/usr/bin/env python
"""One side of a same-session old-vs-new bench A/B (VERDICT r9 item 1).

Loads the engine from the repo directory given in argv[1] (either the
live working tree or a ``git archive`` of the previous round's code),
starts its own Spark session, then executes line commands on stdin:

    WARM <key>   run the key once untimed (JIT/codegen warm)  -> OK
    RUN <key>    one timed noop-sink execution                -> OK <key> <sec>
    QUIT         stop the session and exit

Replies are single lines on stdout: ``READY`` after startup, then
``OK ...`` / ``ERR <key> <msg>`` per command. The PARENT alternates RUN
commands between the old and new worker, so both variants sample the
same box weather — the ratio of their min-of-N is like-for-like by
construction, which cross-round baseline ratios (recorded under
different weather) are not.
"""

from __future__ import annotations

import os
import sys
import time


def main() -> int:
    repo_dir, sf_dir = sys.argv[1], sys.argv[2]
    sys.path.insert(0, repo_dir)
    os.chdir(repo_dir)

    from fitness_data_ingest_spark.registry import all_queries
    from fitness_data_ingest_spark.session import get_spark

    spark = get_spark(
        app_name=f"fdis-bench-ab-{os.path.basename(repo_dir)}",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    registry = all_queries()
    print("READY", flush=True)

    for line in sys.stdin:
        parts = line.split()
        if not parts:
            continue
        cmd = parts[0].upper()
        if cmd == "QUIT":
            break
        key = parts[1] if len(parts) > 1 else ""
        try:
            if key not in registry:
                print(f"ERR {key} no_such_key", flush=True)
                continue
            try:
                spark._jvm.System.gc()
            except Exception:
                pass
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            registry[key].spark(spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            took = time.perf_counter() - t0
            if cmd == "WARM":
                print(f"OK {key}", flush=True)
            else:
                print(f"OK {key} {took:.3f}", flush=True)
        except Exception as exc:  # noqa: BLE001 — parent records the error
            msg = f"{type(exc).__name__}".replace(" ", "_")
            print(f"ERR {key} {msg}", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
