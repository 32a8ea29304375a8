#!/usr/bin/env python3
"""Resource-bounded, resumable variant of tools/check.py for LARGE
scale factors (sf1+), where a handful of oracle queries need explicit
discipline a 128 GB box doesn't forgive:

- fresh DuckDB connection per query (memory released between queries),
- an explicit memory_limit + spill temp_directory (the default 80%%
  limit plus a repo-cwd .tmp spill filled RAM and the root disk at
  sf1 — the OOM killer took the whole gate down twice),
- a per-query wall-clock timeout enforced with con.interrupt()
  (a monster oracle records TIMEOUT and the gate moves on),
- resume: --done <log>... skes queries already PASSed in prior logs.

Usage:
  python3 tools/check_scaled.py <sfDir> <verifyOutDir> \
      [--timeout SEC] [--memory GB] [--done log ...]
"""
import json
import os
import sys
import threading

import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import check  # noqa: E402  (canon + TABLES, the same compare)


def run_one(sf_dir, out_dir, name, sql, timeout_s, mem_gb, spill):
    con = duckdb.connect()
    try:
        con.execute(f"SET memory_limit='{mem_gb}GB'")
        con.execute(f"SET temp_directory='{spill}'")
        for t in check.TABLES:
            con.sql(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        timer = threading.Timer(timeout_s, con.interrupt)
        timer.start()
        try:
            got_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_cols = [c.lower() for c in got_rel.columns]
            got = check.canon(got_rel.fetchall(), got_cols)
            exp_rel = con.sql(sql)
            exp_cols = [c.lower() for c in exp_rel.columns]
            exp = check.canon(exp_rel.fetchall(), exp_cols)
        finally:
            timer.cancel()
        if sorted(got_cols) != sorted(exp_cols):
            return ("FAIL", f"columns {sorted(got_cols)} != {sorted(exp_cols)}")
        if got != exp:
            diff_g = [r for r in got if r not in exp][:3]
            diff_e = [r for r in exp if r not in got][:3]
            return ("FAIL", f"{len(got)} rows vs {len(exp)} oracle rows; "
                    f"spark-only {diff_g}; oracle-only {diff_e}")
        return ("PASS", f"{len(got)} rows")
    except duckdb.InterruptException:
        return ("TIMEOUT", f">{timeout_s}s")
    except Exception as e:  # noqa: BLE001 — record and move on
        msg = str(e)
        if "INTERRUPT" in msg.upper():
            return ("TIMEOUT", f">{timeout_s}s")
        return ("FAIL", f"error {msg[:300]}")
    finally:
        con.close()


def main(argv):
    sf_dir, out_dir = argv[0], argv[1]
    timeout_s, mem_gb, done_logs = 1800, 48, []
    i = 2
    while i < len(argv):
        if argv[i] == "--timeout":
            timeout_s = int(argv[i + 1]); i += 2
        elif argv[i] == "--memory":
            mem_gb = int(argv[i + 1]); i += 2
        elif argv[i] == "--done":
            done_logs = argv[i + 1:]; break
        else:
            raise SystemExit(f"unknown arg {argv[i]}")
    done = set()
    for log in done_logs:
        if os.path.exists(log):
            for line in open(log):
                if line.startswith("PASS "):
                    done.add(line.split()[1])
    spill = "/tmp/duck_spill"
    os.makedirs(spill, exist_ok=True)
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    todo = {k: v for k, v in sorted(oracle.items()) if k not in done}
    print(f"== scaled gate: {len(todo)} to run, {len(done)} already passed, "
          f"mem={mem_gb}GB timeout={timeout_s}s ==", flush=True)
    counts = {"PASS": len(done), "FAIL": 0, "TIMEOUT": 0}
    for name, sql in todo.items():
        status, detail = run_one(sf_dir, out_dir, name, sql,
                                 timeout_s, mem_gb, spill)
        counts[status] += 1
        print(f"{status} {name} ({detail})", flush=True)
    print(f"== {counts['PASS']} pass, {counts['FAIL']} fail, "
          f"{counts['TIMEOUT']} timeout ==", flush=True)
    return 1 if counts["FAIL"] else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
