#!/usr/bin/env python3
"""Regenerate BENCH_FLOOR.md from one or more clean BENCH_FULL.json runs.

Usage: make_floor.py [--carry-notes OLD_FLOOR.md] run1.json [...] > BENCH_FLOOR.md

Floor per query = the MINIMUM of the runs' medians (a floor is the
best believed-quiet number, so minima across clean runs are the right
aggregation). Streaming/sentinel metadata is taken from the last run
listed (pass the cleanest run last).

--carry-notes re-emits the adjudication paragraphs of an existing
floor doc (every paragraph after the table whose first line starts
with "r<digit>") below the new table — without it, a regeneration
silently drops all per-round notes except the r10 one embedded here
(that drop happened in r11 and had to be restored by hand).
"""
import json
import re
import sys


# Adjudication blocks this script's template embeds verbatim, keyed by
# round tag with a stable prefix of the embedded heading. carried_notes
# skips ONLY a block matching both the tag and its marker — a second,
# genuinely new note for the same round is carried, not dropped
# (ADVICE r12: the tag-only skip silently ate any later r10 paragraph).
EMBEDDED_BLOCKS = {"r10": "r10 adjudication (`boilerplate_phrases`)"}


def carried_notes(path):
    """Paragraphs after the floor table starting with r<digit> — the
    per-round adjudication notes appended over time. Warns on stderr
    which blocks were carried vs skipped so a dropped paragraph is
    loud, not silent."""
    txt = open(path).read()
    notes = []
    skipped = {tag: 0 for tag in EMBEDDED_BLOCKS}
    for block in txt.split("\n\n"):
        m = re.match(r"^(r\d+)\s", block)
        if not m:
            continue
        tag = m.group(1)
        head = block.strip().splitlines()[0][:70]
        marker = EMBEDDED_BLOCKS.get(tag)
        if marker and block.strip().startswith(marker):
            skipped[tag] += 1
            if skipped[tag] > 1:
                sys.exit(f"make_floor: embedded {tag} block appears "
                         f"{skipped[tag]} times in {path} — deduplicate "
                         "the source doc before regenerating")
            print(f"make_floor: skipping embedded {tag} block: {head}",
                  file=sys.stderr)
        else:
            print(f"make_floor: carrying {tag} block: {head}",
                  file=sys.stderr)
            notes.append(block.strip())
    return notes


def main(paths):
    if not paths:
        sys.exit("usage: make_floor.py [--carry-notes OLD.md] run1.json [...]"
                 " > BENCH_FLOOR.md")
    notes = []
    if paths[0] == "--carry-notes":
        notes = carried_notes(paths[1])
        paths = paths[2:]
    runs = [json.load(open(p)) for p in paths]
    floor = {}
    for r in runs:
        for q, v in r["queries"].items():
            floor[q] = min(floor.get(q, float("inf")), v)
    last = runs[-1]
    names = sorted(floor)
    total = sum(floor.values())
    # streaming floor = the best (highest-throughput) clean measurement;
    # runs whose stream failed publish rows_per_sec null — skip them
    stream = max(
        (r.get("streaming") or {} for r in runs),
        key=lambda s: s.get("rows_per_sec") or 0)
    if stream.get("rows_per_sec") is None:
        # every run's stream failed — say so explicitly rather than
        # printing placeholder values into the generated doc
        stream = {"rows_per_sec": 0, "n_batches": 0,
                  "rows_per_batch": 0, "unavailable": True}
    sent = last.get("sentinel") or {}
    print(f"""# BENCH_FLOOR — quiet-box per-query reference medians

A trustworthy per-query floor for future rounds: the per-query MINIMUM
of {len(runs)} run(s) ({len(names)} queries, sf0.1,
minima are load-safe: contention only inflates a run's medians,
`local[32]`, reps={last.get('reps')} medians after per-query warm-up,
noop sink). Last run's sentinel: pre {sent.get('pre')} s / post
{sent.get('post')} s, swing {round(100 * (sent.get('swing') or 0))}% —
`"contaminated": {str(last.get('contaminated')).lower()}`. Sum of
floors {total:.2f} s; streaming {'UNAVAILABLE (every run failed to complete enough batches)' if stream.get('unavailable') else f"{stream.get('rows_per_sec'):,} rows/s (best clean run) over {stream.get('n_batches')} completed batches at {stream.get('rows_per_batch'):,} rows/batch"}. Streaming methodology
changed r8: numPartitions now = cores (the r7 "12% gap" was an
8-source-partition cap on a 32-core box, worth ~2.3x), and the metric
is the STEADY-STATE MEDIAN of per-batch rows/s (4 warm-up batches
dropped, up to 16 sampled) with a `batch_spread` (max/min) stability
stamp — sum/sum over a small fixed sample swung 346k-914k across
clean runs purely from the ~4-6-batch JIT ramp and host-neighbor
bursts the pre/post sentinel cannot see. Clean-box medians observed:
935k-965k rows/s; treat < ~500k WITH an acceptable spread stamp as a
real regression. Since r9 the acceptance stamp is
`batch_spread_trimmed` (max/min AFTER dropping the single best and
worst batch): one GC-paused batch in an otherwise steady sample flips
raw max/min past 2 on a provably quiet box without moving the median,
while the trimmed stamp still catches unfinished ramps and sustained
contention. Distrust any value whose TRIMMED spread is > 2 (raw
spread stays published for disclosure). Diff future
`BENCH_rN.json` per-query entries against THIS table, not against
other BENCH artifacts — any entry >2x its floor on a run whose own
sentinel swung is machine noise, not a regression (the r4 lesson).
Regenerate: `tools/make_floor.py BENCH_FULL.json > BENCH_FLOOR.md`
(quiet box only — do NOT run anything else, even a test suite, while
the bench runs).

r10 adjudication (`boilerplate_phrases`): the r9 driver's 1.241 s and
several ISOLATED single-query runs at 0.83-0.93 s looked like a drift
off the 0.52 floor, but the code path is byte-identical to the
floor-era commit (the floor-era binary also measured 0.828 s when run
isolated) and all three r10 FULL-SUITE runs came back at 0.525-0.77 s
medians (0.511 best rep) — the floor holds. The discrepancy is
isolated-run vs full-suite JVM warmth (shared JIT/page-cache state a
155-query suite accumulates), not a plan or data regression: diagnose
this query inside a full run, not with SPARK_GRAFT_ONLY.

| query | median s | query | median s |
|---|---|---|---|""")
    half = (len(names) + 1) // 2
    for i in range(half):
        left = f"| {names[i]} | {floor[names[i]]:.3f} "
        j = i + half
        right = f"| {names[j]} | {floor[names[j]]:.3f} |" if j < len(names) else "| | |"
        print(left + right)
    for block in notes:
        print()
        print(block)


if __name__ == "__main__":
    main(sys.argv[1:])
