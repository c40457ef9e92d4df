"""Tests for the TPU work-queue driver (scripts/queue.sh) helpers.

The driver cd's to its script's parent directory, so each test copies it
into a sandbox (tmp_path/scripts/queue.sh) - runs/, artifacts/ and stage
logs all stay inside tmp_path.  ISOSR_QUEUE_NO_PROBE=1 skips the tunnel
probe (which would otherwise create a jax client against the
single-client TPU tunnel from inside a test).  Covers run_stage
(rc logging, timeout, log snapshotting), expect_new_run's stale-run
guard, and the pid-file lifecycle bench.py's preemption relies on.
"""

import os
import shutil
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_queue(tmp_path, jobtext):
    scripts = tmp_path / "scripts"
    scripts.mkdir(exist_ok=True)
    shutil.copy(os.path.join(REPO, "scripts/queue.sh"),
                scripts / "queue.sh")
    job = tmp_path / "job.sh"
    job.write_text(jobtext)
    env = dict(os.environ, ISOSR_QUEUE_NO_PROBE="1",
               ISOSR_QUEUE_PIDDIR=str(tmp_path))
    r = subprocess.run(["bash", str(scripts / "queue.sh"), str(job)],
                       capture_output=True, text=True, timeout=120,
                       env=env)
    return r


def status_tail(before):
    s = "/tmp/tpu_queue.status"
    text = open(s).read() if os.path.exists(s) else ""
    return text[len(before):]


def status_now():
    s = "/tmp/tpu_queue.status"
    return open(s).read() if os.path.exists(s) else ""


def test_run_stage_rc_and_marker(tmp_path):
    before = status_now()
    lf = tmp_path / "stage.log"
    r = run_queue(tmp_path, f"""
run_stage t_ok 30 {lf} -- bash -c 'echo hello-stage'
rc_ok=$?
run_stage t_fail 30 {lf}.fail -- bash -c 'exit 3'
rc_fail=$?
log "test rcs ok=$rc_ok fail=$rc_fail"
""")
    assert r.returncode == 0, r.stderr
    after = status_tail(before)
    assert "stage t_ok rc=0" in after
    assert "stage t_fail rc=3" in after
    assert "test rcs ok=0 fail=3" in after
    assert "QUEUE job.sh DONE" in after
    assert "hello-stage" in lf.read_text()
    # stage log snapshotted into the (sandboxed) artifacts dir
    assert (tmp_path / "artifacts" / "logs" / "stage.log").exists()


def test_run_stage_timeout_kills(tmp_path):
    before = status_now()
    r = run_queue(tmp_path, f"""
run_stage t_slow 2 {tmp_path}/slow.log -- sleep 30
log "slow rc=$?"
""")
    assert r.returncode == 0
    assert "slow rc=124" in status_tail(before)   # timeout's exit code


def test_expect_new_run_guards_stale_runs(tmp_path):
    before = status_now()
    r = run_queue(tmp_path, """
mkdir -p runs/run00001
touch runs/run00001/config.json runs/run00001/params.npz
PRE=$(newest_run)
# no new run appeared -> must fail even though run00001 is complete
if NEW=$(expect_new_run "$PRE"); then log "BAD stale accepted $NEW"
else log "ok stale rejected"; fi
# a new but INCOMPLETE run dir -> still rejected
mkdir -p runs/run00002; touch runs/run00002/config.json
if NEW=$(expect_new_run "$PRE"); then log "BAD incomplete accepted"
else log "ok incomplete rejected"; fi
# complete new run -> accepted
touch runs/run00002/params.npz
NEW=$(expect_new_run "$PRE") && log "ok accepted $(basename $NEW)"
""")
    assert r.returncode == 0, r.stderr
    after = status_tail(before)
    assert "BAD" not in after
    assert "ok stale rejected" in after
    assert "ok incomplete rejected" in after
    assert "ok accepted run00002" in after


def test_pidfile_lifecycle(tmp_path):
    # the driver's pid dir is sandboxed to tmp_path (ISOSR_QUEUE_PIDDIR)
    # so a real driver starting concurrently in /tmp can't perturb this
    r = run_queue(tmp_path, 'log "noop"\n')
    assert r.returncode == 0
    left = [f for f in os.listdir(tmp_path) if f.startswith("queue_")]
    assert left == []                      # pid file removed on exit
