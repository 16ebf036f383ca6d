#!/usr/bin/env python3
"""Regenerate FLOOR.json — the per-key quiet-box floor control (BASELINE.md).

Floor = per-key MINIMUM over every VALID recorded bench measurement across
all rounds.  A (round, key) sample is valid only if:

  1. the key appears in the round's bench per-key "queries" map (extracted
     from the recorded driver tail; tails are truncated, so only keys whose
     timing survives in the tail contribute), AND
  2. the key is NOT listed in that bench line's "errors" map (a fast-failing
     query records a bogus ~0.06 s "timing"), AND
  3. the round's CORRECTNESS_r{n}.json contains the key with err == null
     (a key missing from the round's correctness run — e.g. the nine event
     keys of round 10's timestamp-unit loader bug — was erroring that round,
     so its bench number is a failure artifact, not a floor).

This is the rule the round-13 verdict asked for after tumble_sum's floor was
polluted by round 10's erroring event keys (0.0588 s from a query that threw
at plan time).  Usage:  python3 tools/make_floor.py   (writes FLOOR.json).
"""
import glob
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def extract_map(tail, name):
    """Pull {"key":float,...} pairs out of the (possibly truncated) `name`
    map in a recorded bench tail. Truncation can cut the map's head, so we
    only harvest pairs that appear intact between the map's opening and its
    closing brace."""
    m = re.search(r'"%s":\{' % name, tail)
    if m:
        seg = tail[m.end():]
        end = seg.find("}")
        seg = seg[: end if end >= 0 else len(seg)]
    else:
        # Map opening truncated away: the tail starts mid-map, so harvest
        # only up to the first closing brace — past it lies a DIFFERENT
        # map (e.g. "errors") whose "key":float pairs would otherwise be
        # misattributed to this one and could deflate a floor.
        end = tail.find("}")
        seg = tail[: end if end >= 0 else len(tail)]
    return dict(re.findall(r'"([A-Za-z0-9_]+)":([0-9]+\.[0-9]+)', seg))


def extract_error_keys(tail):
    """Keys named inside the "errors":{...} map of the tail (best effort —
    truncation may hide some; rule 3 catches those via correctness)."""
    m = re.search(r'"errors":\{', tail)
    if not m:
        return set()
    seg = tail[m.end():]
    return set(re.findall(r'"([A-Za-z0-9_]+)":"', seg))


def main():
    floors = {}
    # Carry forward floors that cannot be re-derived from the committed bench
    # tails (tails keep only the last ~2000 chars, cutting early-alphabet
    # keys; some floors came from local in-round runs whose stdout was never
    # committed).  A carried entry is still subject to the validity rule: its
    # recorded round must have the key green in CORRECTNESS_r{n}.json.
    isolated = {}  # key -> {"isolated_sec": s, "isolated_round": r}
    prev_path = os.path.join(REPO, "FLOOR.json")
    if os.path.exists(prev_path):
        prev = json.load(open(prev_path)).get("keys", {})
        for key, ent in prev.items():
            corr_path = os.path.join(REPO, "CORRECTNESS_r%02d.json" % ent["round"])
            if not os.path.exists(corr_path):
                continue
            row = json.load(open(corr_path)).get(key)
            if row is not None and row.get("err") is None:
                floors[key] = {"floor_sec": ent["floor_sec"],
                               "round": ent["round"]}
                if "isolated_sec" in ent:
                    isolated[key] = {"isolated_sec": ent["isolated_sec"],
                                     "isolated_round": ent["isolated_round"]}
    for bench_path in sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json"))):
        rnd = int(re.search(r"BENCH_r(\d+)\.json", bench_path).group(1))
        bench = json.load(open(bench_path))
        tail = bench.get("tail", "") or ""
        # rule 2: keys the bench itself recorded as erroring
        err_keys = extract_error_keys(tail)
        # rule 3: keys green in that round's correctness run
        corr_path = os.path.join(REPO, "CORRECTNESS_r%02d.json" % rnd)
        if not os.path.exists(corr_path):
            continue
        corr = json.load(open(corr_path))
        ok_keys = {k for k, v in corr.items() if v.get("err") is None}
        # the per-key timings: prefer the queries_min map (min over timed
        # passes) when present, else queries
        timings = extract_map(tail, "queries_min") or extract_map(tail, "queries")
        for key, sec in timings.items():
            if key in err_keys or key not in ok_keys:
                continue
            sec = float(sec)
            if sec <= 0:
                continue
            cur = floors.get(key)
            if cur is None or sec < cur["floor_sec"]:
                floors[key] = {"floor_sec": sec, "round": rnd}
    # Full LOCAL bench records (bench_runs/*.json): the complete JSON line
    # graft.Bench prints, saved in-round because driver tails keep only the
    # last ~2000 chars and so never give early-alphabet keys a floor.  These
    # are untruncated, so their own "errors" map carries rule 2 directly —
    # but rule 3 still applies: a key that benched clean locally yet failed
    # that round's CORRECTNESS gate was producing wrong answers, and a
    # wrong-answer timing must not seed a floor.  When the matching round's
    # correctness file is absent (e.g. a record saved before the round's
    # gate ran), fall back to the record's own errors map alone.
    for local_path in sorted(glob.glob(os.path.join(REPO, "bench_runs", "*.json"))):
        rec = json.load(open(local_path))
        rnd = int(rec.get("round", 0))
        err_keys = set(rec.get("errors", {}))
        corr_path = os.path.join(REPO, "CORRECTNESS_r%02d.json" % rnd)
        ok_keys = None
        if os.path.exists(corr_path):
            corr = json.load(open(corr_path))
            ok_keys = {k for k, v in corr.items() if v.get("err") is None}
        timings = rec.get("queries_min") or rec.get("queries") or {}
        is_keytime = rec.get("kind") == "keytime"
        for key, sec in timings.items():
            if key in err_keys or (ok_keys is not None and key not in ok_keys):
                continue
            sec = float(sec)
            if sec <= 0:
                continue
            cur = floors.get(key)
            if cur is None or sec < cur["floor_sec"]:
                floors[key] = {"floor_sec": sec, "round": rnd}
            if is_keytime:
                # era-refreshed isolated floor (r18): keytime runs the key
                # through the exact Bench harness ISOLATED in a small fresh
                # session, so its min is what the CURRENT box era can
                # attain - keep the LATEST round's isolated min alongside
                # the historical floor and adjudicate against it (adj_sec)
                iso = isolated.get(key)
                if (iso is None or rnd > iso["isolated_round"]
                        or (rnd == iso["isolated_round"]
                            and sec < iso["isolated_sec"])):
                    isolated[key] = {"isolated_sec": sec,
                                     "isolated_round": rnd}
    out = {
        "note": (
            "per-key minimum over every VALID recorded driver bench "
            "measurement, all rounds - the quiet-box floor control described "
            "in BASELINE.md. Validity rule (r14): a (round, key) sample "
            "counts only if the key is absent from that bench line's errors "
            "map AND present with err=null in that round's "
            "CORRECTNESS_r{n}.json - erroring rounds (e.g. r10's event keys) "
            "record bogus fast 'timings' that would poison the min. "
            "Untruncated local bench lines under bench_runs/ also "
            "contribute (their own errors map carries rule 2; rule 3 "
            "cross-checks the matching round's correctness file when it "
            "exists). "
            "Era refresh (r18): bench_runs records with kind='keytime' "
            "carry ISOLATED per-key mins (fresh small session through the "
            "exact Bench harness); the latest isolated min is kept beside "
            "the historical floor as isolated_sec/isolated_round, and "
            "adj_sec (isolated when present, else the floor) is the value "
            "to adjudicate per-key ratios against - historical floors from "
            "old box eras carry a ~1.4-1.6x era factor (BASELINE.md, r17 "
            "keytime finding). "
            "Regenerate with tools/make_floor.py."
        ),
        "keys": {},
    }
    for k in sorted(floors):
        ent = dict(floors[k])
        if k in isolated:
            ent.update(isolated[k])
        ent["adj_sec"] = ent.get("isolated_sec", ent["floor_sec"])
        out["keys"][k] = ent
    with open(os.path.join(REPO, "FLOOR.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("FLOOR.json: %d keys" % len(floors))
    for probe in ("tumble_sum", "session_count", "slide_agg", "asof_join"):
        print(" ", probe, floors.get(probe))


if __name__ == "__main__":
    main()
