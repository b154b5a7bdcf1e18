#!/usr/bin/env python3
"""Coverage proxy report (no scoverage jar resolves offline — documented
stand-in mirroring the reference CI's coverage gate,
/root/reference/.github/workflows/ci-build.yml:14-55).

Computes, from the sources alone:
  - per main-source file: LoC and whether any of its top-level
    objects/classes is referenced from the test suite (test-reachability)
  - suite size: #test cases, #assertions (assert/require in tests),
    #ScalaCheck properties
  - the oracle surface: #queries and #oracle SQL entries in SparkEntry
    (counted from Verify output if present, else from source markers)

Emits one JSON line plus a human summary. A main file with NO test
reference fails the gate (exit 1) unless listed in ALLOW_UNREFERENCED.
"""
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MAIN = os.path.join(ROOT, "src/main/scala")
TEST = os.path.join(ROOT, "src/test/scala")

# entry points exercised by the driver / bench harness, not by specs
ALLOW_UNREFERENCED = {
    "Bench.scala", "Verify.scala", "Main.scala",
    # tools/ mains are operational harnesses run from the CLI; their
    # results are recorded in BENCH/ artifacts
    "KernelBench.scala", "ScalingBench.scala", "QueryTime.scala",
    "StageProf.scala", "DedupScale.scala", "GoldenGen.scala",
    "SpillProbe.scala",
    # round-6 optimization instruments; their artifacts live under
    # plans/r06/ and OPTIMIZATION_r06.md
    "PlanDump.scala", "StreamProbe.scala", "ComponentsProbe.scala",
}

def scala_files(root):
    for dirpath, _, names in os.walk(root):
        for n in names:
            if n.endswith(".scala"):
                yield os.path.join(dirpath, n)

def top_level_names(text):
    return set(re.findall(r"^(?:final\s+)?(?:case\s+)?(?:object|class|trait)\s+(\w+)",
                          text, re.M))

def main():
    test_text = ""
    n_tests = n_asserts = n_props = 0
    for f in scala_files(TEST):
        t = open(f, encoding="utf-8").read()
        test_text += t
        n_tests += len(re.findall(r'\btest\("', t))
        n_asserts += len(re.findall(r"\bassert\(|\brequire\(", t))
        n_props += len(re.findall(r"\bProp\.forAll\b", t))

    # per-file top-level names + raw text, for transitive reachability:
    # a file is covered if tests reference it directly OR a covered file
    # references one of its top-level names (tests execute it via that
    # caller — e.g. the typed aggregators run inside the dedup queries)
    infos = {}
    for f in sorted(scala_files(MAIN)):
        rel = os.path.relpath(f, MAIN)
        t = open(f, encoding="utf-8").read()
        loc = sum(1 for line in t.splitlines()
                  if line.strip() and not line.strip().startswith("//"))
        infos[rel] = {"text": t, "loc": loc, "names": top_level_names(t)}

    covered = {rel for rel, i in infos.items()
               if any(re.search(r"\b%s\b" % re.escape(n), test_text)
                      for n in i["names"])}
    changed = True
    while changed:
        changed = False
        for rel, i in infos.items():
            if rel in covered:
                continue
            for crel in list(covered):
                if any(re.search(r"\b%s\b" % re.escape(n), infos[crel]["text"])
                       for n in i["names"]):
                    covered.add(rel)
                    changed = True
                    break

    files = []
    uncovered = []
    total_loc = 0
    for rel, i in sorted(infos.items()):
        total_loc += i["loc"]
        is_cov = rel in covered
        if not is_cov and os.path.basename(rel) not in ALLOW_UNREFERENCED:
            uncovered.append(rel)
        files.append({"file": rel, "loc": i["loc"], "covered": is_cov})

    n_cov = sum(1 for x in files if x["covered"])
    cov_loc = sum(x["loc"] for x in files if x["covered"])
    report = {
        "metric": "coverage_proxy",
        "note": "test-reachability + assertion counts (scoverage jar "
                "unavailable offline; see tools/coverage_report.py)",
        "main_files": len(files),
        "main_files_test_referenced": n_cov,
        "file_coverage_pct": round(100.0 * n_cov / max(len(files), 1), 1),
        "loc_total": total_loc,
        "loc_in_test_referenced_files": cov_loc,
        "loc_coverage_pct": round(100.0 * cov_loc / max(total_loc, 1), 1),
        "test_cases": n_tests,
        "assertions": n_asserts,
        "scalacheck_properties": n_props,
        "unreferenced_files": uncovered,
    }
    print(json.dumps(report))
    print("coverage-proxy: %d/%d main files test-referenced (%.1f%% of LoC), "
          "%d tests / %d assertions / %d properties"
          % (n_cov, len(files), report["loc_coverage_pct"],
             n_tests, n_asserts, n_props), file=sys.stderr)
    if uncovered:
        print("UNREFERENCED (gate fails): %s" % ", ".join(uncovered),
              file=sys.stderr)
        sys.exit(1)

if __name__ == "__main__":
    main()
