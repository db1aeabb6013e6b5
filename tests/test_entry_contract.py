"""Driver-contract invariants over __spark_entry__ — pure dict checks,
no Spark session. These pin the properties the driver's correctness
pass depends on (and that a future queries() rotation could silently
break): oracle coverage, name uniqueness, and the staged r5 queue
staying disjoint from the live surface until its promotion."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as E


def test_every_query_has_an_oracle():
    qs, oracles = E.queries(), E.oracle_sql()
    missing = [n for n in qs if n not in oracles]
    assert not missing, f"queries without oracle SQL: {missing}"


def test_no_orphan_oracles():
    qs, oracles = E.queries(), E.oracle_sql()
    orphans = [n for n in oracles if n not in qs]
    assert not orphans, f"oracle SQL without a query: {orphans}"


def test_driver_window_keeps_staleness_bound():
    # Standing rotation policy (r11): the driver records exactly the
    # first 50 entries, the live surface exceeds 2x50, so evidence
    # rotates on a cycle. The policy bound — pinned here, derived from
    # the union of every CORRECTNESS_r*.json so the test SELF-UPDATES
    # when the driver writes a new round's file — is: assuming the
    # upcoming round records the current window, NO query's latest
    # green driver row is older than MAX_STALENESS (=3; the smallest
    # satisfiable bound at 143 queries — see the feasibility proof in
    # tools/touched_queries.py) rounds. This subsumes the old
    # invariants: a never-checked query must sit in the window (its
    # effective round would be None), and every tail entry must be
    # green at its latest check (a failing latest row is not green, so
    # it forces the query back into the window).
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    import touched_queries as tq

    order = list(E.queries())
    assert len(order) == 143
    violations = tq.staleness_violations(E)
    assert not violations, (
        f"queries whose driver evidence breaches the {tq.MAX_STALENESS}-round "
        f"bound (rotate them into the first {tq.WINDOW_SIZE}): {violations}"
    )


def test_rotation_policy_window_is_feasible_next_round():
    # Lookahead guard against pile-up: the queries left OUT of this
    # round's window become next round's forced set (their evidence
    # ages by one). Together with headroom for touched/new queries,
    # the forced carry-over must fit the 50-row cap — if this fails,
    # the current fill is too shallow (stalest-first fill keeps the
    # carry-over minimal by construction).
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    import touched_queries as tq

    n = tq.next_round_number()
    latest = tq.latest_green_rounds()
    order = list(E.queries())
    window = set(order[: tq.WINDOW_SIZE])
    forced_next = [
        q
        for q in order
        if q not in window
        and (n + 1) - latest.get(q, -(10**9)) > tq.MAX_STALENESS
    ]
    assert len(forced_next) <= tq.WINDOW_SIZE - 10, (
        "next round's forced carry-over leaves <10 slots of headroom: "
        f"{len(forced_next)} queries {forced_next[:5]}..."
    )


def test_rotation_policy_feasibility():
    # The bound is satisfiable iff MAX_STALENESS >= ceil(n / 50): a
    # full rotation of n queries through 50-slot windows takes
    # ceil(n/50) rounds, which is the steady-state worst-case evidence
    # age. r10 proved the converse the hard way — 141 queries under
    # MAX_STALENESS=2 needs 100 slots it doesn't have. Growing
    # queries() past WINDOW_SIZE * MAX_STALENESS must raise the bound
    # in the same commit (and the bound should not be raised further
    # than the surface requires — evidence freshness is the product).
    import math
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    import touched_queries as tq

    need = math.ceil(len(E.queries()) / tq.WINDOW_SIZE)
    assert tq.MAX_STALENESS == need, (
        f"{len(E.queries())} queries / {tq.WINDOW_SIZE}-slot windows "
        f"need MAX_STALENESS exactly {need}, found {tq.MAX_STALENESS}"
    )


def test_touched_queries_are_inside_driver_window():
    # r7 lesson: a hand-curated "touched this round" list missed the
    # band-kernel refactor's tail-query consumers, leaving three
    # queries with silently-stale driver evidence. The touched set is
    # now DERIVED — changed outboxx_spark modules since the round-base
    # commit (reverse import closure), per-function source diffs of
    # __spark_entry__.py, and oracle-SQL hash drift vs the committed
    # snapshot — and every touched query must sit inside the 50-entry
    # window so the driver re-records it this round.
    import subprocess
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    sys.path.insert(0, str(repo / "tools"))
    import touched_queries as tq

    try:
        base = tq.round_base_commit()
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        import pytest

        pytest.skip(f"git history unavailable: {e}")
    touched = tq.touched_queries(E, base)
    window = set(list(E.queries())[:50])
    outside = {n: sorted(r) for n, r in touched.items() if n not in window}
    assert not outside, (
        "queries touched since the last driver round are outside the "
        f"50-entry window (rotate them in): {outside}"
    )


def test_round_base_commit_boundary_state_uses_head(tmp_path):
    # r8 judge finding: at the driver round boundary the newest
    # CORRECTNESS_r*.json exists but is UNTRACKED — `git log -1 -- f`
    # emits '' with exit 0, and the '' base crashed touched_queries()
    # with CalledProcessError (exit 128 from `git diff ''`). r12 judge
    # finding on the r8 fix: falling back to the PREVIOUS committed
    # correctness file double-counted the entire prior round's diff as
    # "touched", making the feasibility lookahead fire at every round
    # boundary. The contract now: untracked newest file -> base is
    # HEAD (the driver measured the repo as committed); committed
    # newest file -> its last-touching commit; no correctness file at
    # all -> FileNotFoundError (the contract test's skip path).
    import subprocess
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    import touched_queries as tq

    def git(*args):
        return subprocess.run(
            ["git", *args], cwd=tmp_path, capture_output=True,
            text=True, check=True,
        ).stdout.strip()

    git("init", "-q")
    git("config", "user.email", "t@t")
    git("config", "user.name", "t")
    (tmp_path / "CORRECTNESS_r01.json").write_text("{}")
    git("add", "CORRECTNESS_r01.json")
    git("commit", "-qm", "r1")
    r1_commit = git("rev-parse", "HEAD")
    # round work lands after the r01 artifact commit
    (tmp_path / "work.py").write_text("x = 1\n")
    git("add", "work.py")
    git("commit", "-qm", "round work")
    head = git("rev-parse", "HEAD")
    old_repo = tq.REPO
    try:
        tq.REPO = tmp_path
        # committed newest file: its last-touching commit is the base
        assert tq.round_base_commit() == r1_commit
        # the boundary state: driver wrote r02, nothing committed it
        # yet -> the base is HEAD, NOT the stale r01 commit (which
        # would re-flag the whole round's diff as touched)
        (tmp_path / "CORRECTNESS_r02.json").write_text("{}")
        assert tq.round_base_commit() == head
        # no correctness file at all -> FileNotFoundError, not a crash
        (tmp_path / "CORRECTNESS_r02.json").unlink()
        (tmp_path / "CORRECTNESS_r01.json").unlink()
        git("rm", "-q", "--cached", "CORRECTNESS_r01.json")
        git("commit", "-qm", "drop")
        import pytest

        with pytest.raises(FileNotFoundError):
            tq.round_base_commit()
    finally:
        tq.REPO = old_repo


def test_build_window_feasible_at_boundary_state(tmp_path, monkeypatch):
    # End-to-end pin of the r12 "Next round #2" ask: in the boundary
    # state (untracked newest CORRECTNESS file, round work committed at
    # HEAD), build_window() must be FEASIBLE — the forced set is only
    # the genuinely stale queries, not stale + the whole prior round's
    # diff. Exercised against the real entry surface with a synthetic
    # git repo standing in for the boundary.
    import subprocess
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    import touched_queries as tq

    repo = Path(__file__).resolve().parent.parent

    def git(*args, cwd=tmp_path):
        return subprocess.run(
            ["git", *args], cwd=cwd, capture_output=True,
            text=True, check=True,
        ).stdout.strip()

    git("init", "-q")
    git("config", "user.email", "t@t")
    git("config", "user.name", "t")
    # mirror the real correctness history + entry/oracle state so the
    # staleness inputs are the live ones, then leave the newest file
    # untracked (the boundary)
    import shutil

    corr = sorted(repo.glob("CORRECTNESS_r*.json"))
    for f in corr[:-1]:
        shutil.copy(f, tmp_path / f.name)
    shutil.copy(repo / "__spark_entry__.py", tmp_path / "__spark_entry__.py")
    git("add", "-A")
    git("commit", "-qm", "prior rounds")
    shutil.copy(corr[-1], tmp_path / corr[-1].name)  # untracked newest
    old_repo = tq.REPO
    try:
        tq.REPO = tmp_path
        base = tq.round_base_commit()
        assert base == git("rev-parse", "HEAD")
        # worktree == HEAD for the entry file, so no touched queries
        # come from the boundary itself; the window must build without
        # the infeasibility RuntimeError
        window = tq.build_window(E, base)
        assert len(window) == tq.WINDOW_SIZE
    finally:
        tq.REPO = old_repo


def test_oracle_snapshot_is_current():
    # The oracle-hash snapshot is the baseline the touched-query
    # derivation compares against; a stale snapshot would flag every
    # oracle as touched (fail loud), an un-regenerated one after a
    # deliberate oracle change must be refreshed consciously via
    # `python tools/touched_queries.py --snapshot` TOGETHER with
    # rotating the affected queries into the window (the test above
    # enforces the rotation half).
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    sys.path.insert(0, str(repo / "tools"))
    import touched_queries as tq

    assert tq.ORACLE_SNAPSHOT.exists(), (
        "run: python tools/touched_queries.py --snapshot"
    )
    drifted = tq.changed_oracles(E)
    window = set(list(E.queries())[:50])
    outside_window = drifted - window
    assert not outside_window, (
        "oracle SQL changed for out-of-window queries — rotate them "
        f"into the window and re-snapshot: {sorted(outside_window)}"
    )


def test_staged_queue_is_disjoint_and_oracle_complete():
    staged_q, staged_o = E.queries_staged(), E.oracle_sql_staged()
    assert set(staged_q) == set(staged_o)
    live = set(E.queries())
    assert not (set(staged_q) & live), "staged name collides with queries()"


def test_touched_tool_sees_constant_and_function_changes():
    # unit-level pin of the derivation's three entry-file signals:
    # function-body diffs, module-constant diffs, and the co_names
    # reference walk that ties constants to queries
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    import touched_queries as tq

    old = "SNAP = 1\ndef q_a(s, d):\n    return SNAP\ndef q_b(s, d):\n    return 2\n"
    new = "SNAP = 9\ndef q_a(s, d):\n    return SNAP\ndef q_b(s, d):\n    return 2\n"
    assert tq._entry_assign_sources(old) == {"SNAP": "SNAP = 1"}
    old_fns = tq._entry_fn_sources(old)
    new_fns = tq._entry_fn_sources(new)
    assert old_fns["q_b"] == new_fns["q_b"] and old_fns["q_a"] == new_fns["q_a"]
    # the constant changed, the functions did not
    assert tq._entry_assign_sources(new)["SNAP"] == "SNAP = 9"
    # reference walk: q_a reads SNAP, q_b does not
    ns: dict = {}
    exec(compile(new, "<entry>", "exec"), ns)
    _mods, _helpers, refs_a = tq.query_module_deps(ns["q_a"], ns)
    _mods, _helpers, refs_b = tq.query_module_deps(ns["q_b"], ns)
    assert "SNAP" in refs_a and "SNAP" not in refs_b


def test_externally_defined_queries_carry_their_home_module():
    # olap.* callables are referenced directly in queries(); their
    # co_names resolve in olap.py's namespace, not the entry module's,
    # and their home module must land in the dep set either way — or
    # an olap.py edit would never flag its queries as touched (r8 fix)
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    import touched_queries as tq

    mods, _, _ = tq.query_module_deps(E.queries()["olap_pricing_summary"], vars(E))
    assert "outboxx_spark.olap" in mods
    # and every query must depend on at least one outboxx_spark module
    empty = [
        n
        for n, fn in E.queries().items()
        if not tq.query_module_deps(fn, vars(E))[0]
    ]
    assert not empty, f"queries with an empty module dep set: {empty}"


def test_all_callables():
    for name, fn in {**E.queries(), **E.queries_staged()}.items():
        assert callable(fn), name


def test_rewrite_queries_dict_preserves_surface():
    # The --rewrite rotation must be surface-preserving: same
    # name -> expression mapping, the freshly computed window as the
    # leading block, and stable under a second application.
    import re
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    import touched_queries as tq

    text = (Path(__file__).resolve().parent.parent / "__spark_entry__.py").read_text()
    try:
        window = tq.build_window(E)
        rnd = tq.next_round_number()
    except FileNotFoundError:
        import pytest

        pytest.skip("no CORRECTNESS files")
    new = tq.rewrite_queries_dict(text, window, rnd)

    def entries(t):
        m = re.search(
            r"^def queries\(\)[^\n]*\n(.*?)^    return \{\n(.*?)^    \}\n",
            t, re.M | re.S,
        )
        return re.findall(r'^\s+"([a-z0-9_]+)": (.+),$', m.group(2), re.M)

    old_e, new_e = entries(text), entries(new)
    assert dict(old_e) == dict(new_e)          # nothing added/lost/changed
    assert [n for n, _ in new_e][: len(window)] == window
    assert entries(tq.rewrite_queries_dict(new, window, rnd)) == new_e
