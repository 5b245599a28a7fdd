#!/usr/bin/env python3
"""Engine-independent host CPU-delivery probe.

Measures the wall time of a fixed pure-ALU workload (no memory traffic, no
I/O, no JVM) on taskset-pinned cores at 1-way, 2-way, 4-way and sustained
4-way concurrency, plus the /proc/stat steal delta. Used to discriminate
"the engine doesn't scale" from "the host doesn't deliver the cores": if the
same fixed lap slows down under sustained 4-way pinned load with ~zero
steal and recovers instantly at <=2-way, the host caps sustained multi-core
delivery below nproc and any >=4-way scaling measurement is host-bound.

Usage: python3 tools/host_cpu_probe.py [seconds_sustained]
Writes BENCH/host_cpu_probe.json.
"""
import json, os, subprocess, sys, time

N = 80_000_000

WORK = (
    "import time,sys\n"
    f"n={N}\n"
    "t0=time.time()\n"
    "x=0\n"
    "for i in range(n): x += i*i%7\n"
    "print(round(time.time()-t0,3))\n")

SUSTAINED = (
    "import time,sys\n"
    f"n={N}\n"
    "t_end=time.time()+float(sys.argv[1])\n"
    "laps=[]\n"
    "while time.time()<t_end:\n"
    "    t0=time.time(); x=0\n"
    "    for i in range(n): x += i*i%7\n"
    "    laps.append(round(time.time()-t0,3))\n"
    "print(json.dumps(laps)) if False else print(laps)\n")


def steal():
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


def lap(core):
    out = subprocess.run(["taskset", "-c", str(core), sys.executable, "-c", WORK],
                         capture_output=True, text=True)
    return float(out.stdout.strip())


def concurrent(cores):
    procs = [subprocess.Popen(["taskset", "-c", str(c), sys.executable, "-c", WORK],
                              stdout=subprocess.PIPE, text=True) for c in cores]
    return [float(p.communicate()[0].strip()) for p in procs]


def sustained(cores, secs):
    procs = [subprocess.Popen(
        ["taskset", "-c", str(c), sys.executable, "-c", SUSTAINED, str(secs)],
        stdout=subprocess.PIPE, text=True) for c in cores]
    return [eval(p.communicate()[0].strip()) for p in procs]


def main():
    secs = float(sys.argv[1]) if len(sys.argv) > 1 else 90.0
    s0 = steal()
    out = {
        "metric": "host_cpu_delivery_probe",
        "lap_work": f"{N} iterations of x += i*i%7 (pure ALU, pinned)",
        "solo_laps": [lap(0) for _ in range(3)],
        "concurrent_2way": concurrent([0, 1]),
        "concurrent_4way_single_lap": concurrent([0, 1, 2, 3]),
        "sustained_4way_laps": sustained([0, 1, 2, 3], secs),
        "solo_lap_immediately_after": lap(0),
    }
    out["steal_delta_jiffies"] = steal() - s0
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/host_cpu_probe.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
