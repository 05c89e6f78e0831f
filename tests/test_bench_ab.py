"""End-to-end test of the same-session old-vs-new bench A/B harness
(tools/bench_ab.py, VERDICT r10 item 1): archive a ref, spawn two real
Spark workers, alternate timed runs, and return like-for-like ratios.

Uses ref=HEAD (old == committed code) on one cheap key at sf0.001, so
the assertion is about the PROTOCOL (both sides execute, parse, ratio
computed), not about performance — a HEAD-vs-worktree ratio on an
identical plan is ~1.0 but weather-noisy, so only sanity bounds are
pinned.
"""

import importlib.util
import os
import subprocess

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_ab():
    spec = importlib.util.spec_from_file_location(
        "bench_ab", os.path.join(HERE, "tools", "bench_ab.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_prev_round_ref_resolves_to_commit_that_added_newest_bench():
    ab = _load_ab()
    ref = ab.prev_round_ref()
    assert ref is not None and len(ref) == 40
    # that commit must contain the newest BENCH_r{N}.json
    shown = subprocess.run(
        ["git", "show", "--stat", "--format=", ref],
        cwd=HERE,
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    assert "BENCH_r" in shown


def test_prev_round_ref_ignores_untracked_bench_records(tmp_path):
    """The driver drops each round's BENCH_r{N}.json UNTRACKED first; a
    worktree-glob resolution picked it, found no add-commit, and nulled
    the ref (VERDICT r10 item 1). Pin: in a clone with an untracked
    BENCH_r99.json present, the ref must still resolve — to the commit
    that added the newest COMMITTED record, not the untracked one."""
    clone = str(tmp_path / "clone")
    subprocess.run(
        ["git", "clone", "--quiet", HERE, clone],
        check=True,
        capture_output=True,
    )
    with open(os.path.join(clone, "BENCH_r99.json"), "w") as f:
        f.write("{}")
    ab = _load_ab()
    ref = ab.prev_round_ref(repo=clone)
    assert ref is not None and len(ref) == 40
    shown = subprocess.run(
        ["git", "show", "--stat", "--format=", ref],
        cwd=clone,
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    assert "BENCH_r99" not in shown and "BENCH_r" in shown


def test_drive_rejects_zero_reps():
    import pytest

    ab = _load_ab()
    with pytest.raises(ValueError):
        ab.drive(None, None, [], reps=0)


def test_ab_compare_end_to_end_on_head():
    ab = _load_ab()
    res = ab.ab_compare(
        ["agg_min_max", "definitely_not_a_key"],
        ref="HEAD",
        sf_dir="/root/testdata/sf0.001",
        reps=2,
    )
    assert res["_ref"] == "HEAD"
    row = res["agg_min_max"]
    assert row["ab_old_sec"] > 0 and row["ab_new_sec"] > 0
    # identical plan both sides: the ratio is weather, not a plan gap —
    # generous sanity bounds only
    assert 0.2 < row["ab_ratio"] < 5.0
    # a key unknown to BOTH sides comes back as evidence, not a crash
    assert res["definitely_not_a_key"]["ab_err"].startswith("warm_failed")
