"""Tests for bench.py's TPU-tunnel queue preemption helpers.

The tunnel is single-client (a second jax client blocks on its first
compute), so the round-end benchmark must be able to TERM an in-flight
work-queue process tree recorded in /tmp/queue*.pid.  These tests cover
the /proc descendant walker and the stale-pid-file guard without
touching any real queue (a scratch pid_glob points at this test's own
fixtures).
"""

import os
import signal
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def test_descendants_finds_process_tree():
    # bash -> (sleep child); the walker must report the sleep leaf.
    proc = subprocess.Popen(
        ["bash", "-c", "sleep 30 & wait"],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    try:
        deadline = time.time() + 5
        desc = []
        while time.time() < deadline:
            desc = bench.descendants(proc.pid)
            if desc:
                break
            time.sleep(0.05)
        assert desc, "no descendants found for the bash wrapper"
        comms = []
        for p in desc:
            try:
                with open(f"/proc/{p}/comm") as fh:
                    comms.append(fh.read().strip())
            except OSError:
                pass
        assert "sleep" in comms
    finally:
        proc.send_signal(signal.SIGKILL)
        proc.wait()


def test_descendants_of_dead_pid_is_empty():
    proc = subprocess.Popen(["true"])
    proc.wait()
    assert bench.descendants(proc.pid) == []


def test_preempt_queues_kills_only_verified_queue_trees(tmp_path):
    # A fake queue driver whose cmdline contains "tpu_queue" (the
    # verification token) with a sleep child ...
    fake = tmp_path / "tpu_queue_fake.sh"
    fake.write_text("#!/bin/bash\nsleep 300 & wait\n")
    fake.chmod(0o755)
    queue = subprocess.Popen(["bash", str(fake)],
                             stdout=subprocess.DEVNULL,
                             stderr=subprocess.DEVNULL)
    # ... an innocent bystander process ...
    bystander = subprocess.Popen(["sleep", "300"])
    # ... and a stale pid file pointing at the bystander (whose cmdline
    # does NOT contain "tpu_queue" -> must be skipped).
    (tmp_path / "queue01.pid").write_text(str(queue.pid))
    (tmp_path / "queue02.pid").write_text(str(bystander.pid))
    (tmp_path / "queue03.pid").write_text("not-a-pid")
    try:
        deadline = time.time() + 5
        while time.time() < deadline and not bench.descendants(queue.pid):
            time.sleep(0.05)
        n = bench.preempt_queues(pid_glob=str(tmp_path / "queue*.pid"),
                                 grace_s=5.0, settle_s=0.0)
        assert n == 1
        assert queue.wait(timeout=10) != 0          # queue tree is gone
        assert bystander.poll() is None             # bystander untouched
    finally:
        for p in (queue, bystander):
            try:
                p.send_signal(signal.SIGKILL)
            except ProcessLookupError:
                pass
            p.wait()
