#!/usr/bin/env python3
"""Regenerate the paper-trail totals from MEASURED artifacts instead of
hand-writing them (they drifted by a few tests in r9-r11 because the
counts were typed before the final commit).

Inputs:
  --test-log FILE    a captured `sbt test` output (the ScalaTest summary
                     lines "Total number of tests run: N" and
                     "Tests: succeeded N, failed N, canceled N, ...")
  --verify-dir DIR   a graft.Verify dump (one q_* subdirectory per
                     SparkEntry.queries entry + oracle_sql.json)
  --round N          round number stamped into the COVERAGE totals block
  --check            verify the documents already match; exit 1 if not

Rewrites (in place, loudly failing if a pattern is missing):
  README.md     the "`sbt test` — N tests (M green ..." counter
  COVERAGE.md   the leading counts of the "**Totals (round N):**" block

Usage (last step of a round):
  sbt -batch test | tee target/test_out.log
  sbt -batch "runMain graft.Verify /root/testdata/sf0.01 target/verify_x"
  python3 tools/totals.py --test-log target/test_out.log \
      --verify-dir target/verify_x --round 12
"""
import argparse, json, os, re, sys


def parse_test_log(path):
    txt = open(path, errors="replace").read()
    m_total = re.findall(r"Total number of tests run: (\d+)", txt)
    m_counts = re.findall(
        r"Tests: succeeded (\d+), failed (\d+), canceled (\d+)", txt)
    if not m_total or not m_counts:
        sys.exit(f"no ScalaTest summary found in {path}")
    # the LAST summary is the full-suite one when the log holds several
    total = int(m_total[-1])
    succeeded, failed, canceled = map(int, m_counts[-1])
    if failed:
        sys.exit(f"test log records {failed} FAILURES — fix before "
                 "regenerating totals")
    # "Total number of tests run" EXCLUDES canceled tests; the
    # documents count defined tests = run + canceled
    return total + canceled, succeeded, canceled


def count_queries(verify_dir):
    qdirs = sorted(d for d in os.listdir(verify_dir)
                   if d.startswith("q_") and
                   os.path.isdir(os.path.join(verify_dir, d)))
    oracle = json.load(open(os.path.join(verify_dir, "oracle_sql.json")))
    missing = sorted(set(oracle) - set(qdirs))
    if missing:
        sys.exit(f"oracle_sql.json names queries with no dump: {missing}")
    return len(qdirs), len(oracle), sorted(set(qdirs) - set(oracle))


def rewrite(path, pattern, repl, check):
    txt = open(path).read()
    new, n = re.subn(pattern, repl, txt, count=1)
    if n != 1:
        sys.exit(f"{path}: pattern not found — the totals block moved; "
                 f"update tools/totals.py ({pattern!r})")
    if new != txt:
        if check:
            sys.exit(f"{path}: totals are STALE (run tools/totals.py "
                     "without --check)")
        open(path, "w").write(new)
        print(f"rewrote {path}")
    else:
        print(f"{path}: already current")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--test-log", required=True)
    ap.add_argument("--verify-dir", required=True)
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--check", action="store_true")
    a = ap.parse_args()

    total, ok, canceled = parse_test_log(a.test_log)
    nq, noracle, rows_only = count_queries(a.verify_dir)
    print(f"tests: {total} defined, {ok} green, {canceled} canceled; "
          f"queries: {nq} ({noracle} oracle-gated, rows-only: {rows_only})")

    rewrite("README.md",
            r"`sbt test` — \d+ tests \(\d+ green",
            f"`sbt test` — {total} tests ({ok} green", a.check)
    rewrite("COVERAGE.md",
            r"\*\*Totals \(round \d+\):\*\* \d+ driver queries — "
            r"\d+ oracle-checked",
            f"**Totals (round {a.round}):** {nq} driver queries — "
            f"{noracle} oracle-checked", a.check)
    rewrite("COVERAGE.md",
            r"\d+ ScalaTests \(\d+ green",
            f"{total} ScalaTests ({ok} green", a.check)


if __name__ == "__main__":
    main()
