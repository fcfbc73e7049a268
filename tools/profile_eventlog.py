#!/usr/bin/env python3
"""Profile a graft bench event log: group jobs by their `bench:<query>`
job description (Bench sets one per rep), report per-query job/stage wall
and CPU, and the gaps between jobs (driver/trigger latency).

Usage: profile_eventlog.py <eventlog file or rollover dir> [query-filter]
"""
import json, sys, os
from collections import defaultdict


def iter_events(path):
    files = []
    if os.path.isdir(path):
        for n in sorted(os.listdir(path)):
            if n.startswith("events_"):
                files.append(os.path.join(path, n))
    else:
        files = [path]
    for f in files:
        with open(f) as fh:
            for line in fh:
                try:
                    yield json.loads(line)
                except json.JSONDecodeError:
                    pass


def main():
    path = sys.argv[1]
    qfilter = sys.argv[2] if len(sys.argv) > 2 else None
    jobs = {}          # jobId -> dict
    stages = {}        # stageId -> dict
    for ev in iter_events(path):
        e = ev.get("Event")
        if e == "SparkListenerJobStart":
            props = ev.get("Properties") or {}
            desc = props.get("spark.job.description", "")
            jobs[ev["Job ID"]] = {
                "desc": desc, "t0": ev["Submission Time"], "t1": None,
                "stages": [s["Stage ID"] for s in ev.get("Stage Infos", [])],
                "group": props.get("spark.jobGroup.id", ""),
            }
        elif e == "SparkListenerJobEnd":
            if ev["Job ID"] in jobs:
                jobs[ev["Job ID"]]["t1"] = ev["Completion Time"]
        elif e == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            acc = {a["Name"]: a.get("Value") for a in si.get("Accumulables", [])}
            stages[si["Stage ID"]] = {
                "name": si["Stage Name"], "tasks": si["Number of Tasks"],
                "t0": si.get("Submission Time"), "t1": si.get("Completion Time"),
                "cpu": acc.get("internal.metrics.executorCpuTime", 0),
                "run": acc.get("internal.metrics.executorRunTime", 0),
            }

    by_desc = defaultdict(list)
    for jid, j in sorted(jobs.items()):
        if j["t1"] is None:
            continue
        by_desc[j["desc"]].append((jid, j))

    for desc, js in sorted(by_desc.items(), key=lambda kv: -sum(
            j["t1"] - j["t0"] for _, j in kv[1])):
        if qfilter and qfilter not in desc:
            continue
        wall = sum(j["t1"] - j["t0"] for _, j in js)
        span = (max(j["t1"] for _, j in js) - min(j["t0"] for _, j in js))
        # gaps between consecutive jobs of this description
        ordered = sorted(js, key=lambda x: x[1]["t0"])
        gaps = sum(max(0, b[1]["t0"] - a[1]["t1"])
                   for a, b in zip(ordered, ordered[1:]))
        print(f"\n== {desc or '(no description)'}: jobs={len(js)} "
              f"jobwall={wall/1e3:.2f}s span={span/1e3:.2f}s "
              f"interjob_gaps={gaps/1e3:.2f}s")
        for jid, j in ordered:
            jw = (j["t1"] - j["t0"]) / 1e3
            if jw < 0.05:
                continue
            sts = [stages[s] for s in j["stages"] if s in stages]
            stxt = "; ".join(
                f"{s['name'].splitlines()[0][:60]} [{s['tasks']}t "
                f"run={s['run']/1e3:.1f}s cpu={s['cpu']/1e9:.1f}s]"
                for s in sorted(sts, key=lambda s: -(s["run"] or 0))[:3])
            print(f"  job {jid} {jw:6.2f}s  {stxt}")


if __name__ == "__main__":
    main()
