"""Local stand-in for the driver's correctness gate: run every
queries() entry at a given sf_dir and compare against oracle_sql()
via DuckDB (row count + column names + order-insensitive value hash).

Usage:
  python tools/check_queries.py [sf_dir] [only_query ...]
  python tools/check_queries.py --chunked [--chunk K] [--state FILE] \
      [sf_dir] [only_query ...]

``--chunked`` is the crash-resilient sweep mode: queries run in FRESH
subprocesses of K at a time (default 20), results accumulate in a
resumable state file, and a subprocess death (e.g. the Ray-core
``task_manager.cc`` task-GC race that killed two full sweeps in round
4) loses at most one chunk's in-flight query — the runner re-spawns
the remainder, retries the query that was mid-flight at the crash
once alone, and records it as CRASH only if it kills a process twice
by itself. One final JSON line, same shape as the plain mode plus
``crashes``/``restarts``. Re-running with the same ``--state`` file
skips everything already recorded (delete the file for a fresh sweep).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def to_pandas(obj):
    import pandas as pd
    import pyarrow as pa

    try:
        import ray.data as rd

        if isinstance(obj, rd.Dataset):
            return obj.to_pandas()
    except ImportError:
        pass
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    assert isinstance(obj, pd.DataFrame), type(obj)
    return obj


def value_hash(df):
    from collections import Counter

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object or str(df[c].dtype).startswith("string"):
            df[c] = df[c].astype("string")
    rows = Counter(tuple(str(v) for v in row) for row in df.itertuples(index=False))
    return hash(frozenset(rows.items()))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import duckdb

    import __ray_entry__ as entrymod

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name == os.environ.get("CHECK_QUERIES_KILL"):
            # fault-injection hook for the chunked runner's tests:
            # simulate the Ray-core hard death mid-sweep
            os.kill(os.getpid(), 9)
        kill_once = os.environ.get("CHECK_QUERIES_KILL_ONCE", "")
        if kill_once:
            kname, _, flag = kill_once.partition(":")
            if kname == name and flag and not os.path.exists(flag):
                open(flag, "w").close()  # die only the first time
                os.kill(os.getpid(), 9)
        t0 = time.time()
        try:
            got = to_pandas(fn(sf_dir))
            elapsed = round(time.time() - t0, 2)
            if name in oracles:
                want = con.execute(oracles[name]).df()
                ok_rows = len(got) == len(want)
                ok_cols = sorted(got.columns) == sorted(want.columns)
                ok_hash = ok_rows and ok_cols and value_hash(got) == value_hash(want)
                results[name] = {
                    "status": "MATCH" if (ok_rows and ok_cols and ok_hash) else "MISMATCH",
                    "rows": [len(got), len(want)],
                    "cols_ok": ok_cols,
                    "hash_ok": ok_hash,
                    "sec": elapsed,
                }
                if not ok_cols:
                    results[name]["cols"] = [sorted(got.columns), sorted(want.columns)]
            else:
                results[name] = {
                    "status": "ROWS_ONLY",
                    "rows": [len(got), None],
                    "sec": elapsed,
                }
        except Exception as e:  # noqa: BLE001
            import traceback

            results[name] = {"status": "ERROR", "error": f"{type(e).__name__}: {e}"}
            traceback.print_exc()
        print(name, "->", json.dumps(results[name]), flush=True)

    bad = [n for n, r in results.items() if r["status"] in ("MISMATCH", "ERROR")]
    print(json.dumps({"total": len(results), "bad": bad}))
    ray.shutdown()
    return 1 if bad else 0


def _parse_result_lines(text: str) -> dict:
    """Recover per-query results from a (possibly crashed) child's
    stdout: only lines of the exact ``<name> -> {json}`` shape the
    child prints per completed query."""
    out = {}
    for line in text.splitlines():
        if " -> {" not in line:
            continue
        name, _, rest = line.partition(" -> ")
        if not name or " " in name.strip():
            continue
        try:
            out[name.strip()] = json.loads(rest)
        except json.JSONDecodeError:
            continue
    return out


def run_chunked(sf_dir: str, only: list[str], chunk: int, state_path: str) -> int:
    """Fresh-process-per-chunk sweep with resume. Progress is
    guaranteed every iteration: either >=1 new query result lands in
    the state file, or the query that was in flight at a crash gains
    an attempt (two lone-process deaths => recorded as CRASH and
    skipped)."""
    import subprocess

    # enumerate query names WITHOUT initializing Ray in the parent:
    # queries() only builds a dict of callables
    import __ray_entry__ as entrymod

    names = list(entrymod.queries())
    if only:
        missing = sorted(set(only) - set(names))
        if missing:
            print(json.dumps({"error": f"unknown queries {missing}"}))
            return 2
        names = [n for n in names if n in set(only)]

    state = {"sf_dir": sf_dir, "results": {}}
    if os.path.exists(state_path):
        with open(state_path) as f:
            prior = json.load(f)
        if prior.get("sf_dir") == sf_dir:
            state = prior
        else:
            print(f"# state file is for {prior.get('sf_dir')}, starting fresh",
                  flush=True)

    def save():
        tmp = state_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(state, f, indent=1)
        os.replace(tmp, state_path)

    attempts: dict[str, int] = {}
    restarts = 0
    while True:
        pending = [n for n in names if n not in state["results"]]
        if not pending:
            break
        batch = pending[:chunk]
        print(f"# chunk of {len(batch)} (done {len(state['results'])}/"
              f"{len(names)}): {batch[0]}..{batch[-1]}", flush=True)
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), sf_dir, *batch],
                capture_output=True, text=True,
                timeout=240 + 120 * len(batch),
            )
            stdout, crashed = proc.stdout, proc.returncode < 0
        except subprocess.TimeoutExpired as e:
            stdout = (e.stdout or b"").decode() if isinstance(e.stdout, bytes) \
                else (e.stdout or "")
            crashed = True
        got = _parse_result_lines(stdout)
        for n in batch:
            if n in got:
                state["results"][n] = got[n]
        done_in_batch = [n for n in batch if n in got]
        not_done = [n for n in batch if n not in got]
        if not_done:
            # the FIRST unfinished query was in flight at the death;
            # it gets individual retries before being branded CRASH
            restarts += 1
            suspect = not_done[0]
            attempts[suspect] = attempts.get(suspect, 0) + 1
            print(f"# child died ({'signal' if crashed else 'incomplete'}) "
                  f"after {len(done_in_batch)}/{len(batch)}; suspect "
                  f"{suspect} attempt {attempts[suspect]}", flush=True)
            if attempts[suspect] >= 3:
                state["results"][suspect] = {
                    "status": "CRASH",
                    "error": "child process died repeatedly on this query",
                }
        save()

    bad = [n for n, r in state["results"].items()
           if r["status"] in ("MISMATCH", "ERROR", "CRASH")]
    crashes = [n for n, r in state["results"].items()
               if r["status"] == "CRASH"]
    print(json.dumps({
        "total": len(state["results"]), "bad": bad,
        "crashes": crashes, "restarts": restarts,
    }))
    return 1 if bad else 0


def _cli() -> int:
    args = sys.argv[1:]
    chunked = False
    chunk = 20
    state_path = "/tmp/check_queries_state.json"
    rest: list[str] = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--chunked":
            chunked = True
        elif a == "--chunk":
            i += 1
            chunk = int(args[i])
        elif a == "--state":
            i += 1
            state_path = args[i]
        else:
            rest.append(a)
        i += 1
    if not chunked:
        sys.argv = [sys.argv[0]] + rest
        return main()
    sf_dir = rest[0] if rest else "/root/testdata/sf0.01"
    return run_chunked(sf_dir, rest[1:], chunk, state_path)


if __name__ == "__main__":
    sys.exit(_cli())
