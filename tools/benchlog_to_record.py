#!/usr/bin/env python3
"""Convert a raw `sbt runMain graft.Bench` log into the bench_runs/ record
shape (round/note/cpus + the final long JSON line's fields)."""
import json, re, sys

def main():
    log, out, rnd, note, cpus = sys.argv[1:6]
    line = None
    for l in open(log):
        if '"metric"' in l and '"queries"' in l:
            line = json.loads(re.search(r'\{.*\}', l).group(0))
    assert line, "no summary line found"
    rec = {"round": rnd, "note": note, "cpus": cpus}
    rec.update(line)
    json.dump(rec, open(out, "w"), indent=1)
    print(out, "total", line["value"], "keys", len(line["queries"]),
          "errors", len(line.get("errors", {})))

if __name__ == "__main__":
    main()
