#!/usr/bin/env bash
# THE bench entry point: runs graft.Bench and guarantees the process's
# stdout is EXACTLY one JSON line (the driver's contract).
#
# Why a wrapper: the JVM-side redirect in Bench.scala (System.setOut +
# Console.setOut to stderr after the contract line) silences everything
# the bench JVM can reach, but sbt itself still prints its
# `[success] Total time: ...` epilogue on stdout AFTER the forked JVM
# exits — outside the JVM's control, and exactly what truncated the
# r16/r17 driver artifacts (BENCH_rN.json "parsed": null). So the
# wrapper runs sbt with its log level forced to error (no [info]/
# [success] lines) and, belt-and-braces, filters stdout to lines that
# parse as the bench contract (start with `{"metric"`). sbt's exit code
# is preserved so a failed bench still fails the caller.
#
# Usage (env contract identical to the bare sbt invocation):
#   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 tools/bench.sh
set -o pipefail
cd "$(dirname "$0")/.." || exit 1
sbt -error "runMain graft.Bench" | grep '^{"metric"'
status=("${PIPESTATUS[@]}")
# grep finding no line (status[1]=1) means the bench never printed its
# contract line — surface THAT as failure too, not just sbt's own code.
if [ "${status[0]}" -ne 0 ]; then exit "${status[0]}"; fi
exit "${status[1]}"
