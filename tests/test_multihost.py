"""Multi-process distributed search (SURVEY section 5 comm backend +
failure injection): 2 processes x 4 virtual CPU devices over
jax.distributed on localhost.

  * parity: both processes produce results identical to a single-process
    engine on the same corpus;
  * fault injection: SIGKILL one worker MID-BATCH, tear the job down,
    re-initialize a fresh pair and assert results identical to the golden
    run (stateless recovery: re-shard from host arrays, nothing persisted).
"""

import json
import os
import signal
import socket
import subprocess
import sys
import time

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
WORKER = os.path.join(HERE, "mh_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _env():
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # force-plain CPU processes
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    return env


def _launch(port, pid, out, loop=False, heartbeat=""):
    cmd = [
        sys.executable, WORKER,
        "--coordinator", f"127.0.0.1:{port}",
        "--nprocs", "2", "--pid", str(pid), "--out", out,
    ]
    if loop:
        cmd.append("--loop")
    if heartbeat:
        cmd += ["--heartbeat", heartbeat]
    return subprocess.Popen(
        cmd, env=_env(), stdout=subprocess.DEVNULL,
        stderr=subprocess.STDOUT,
    )


def _run_pair(tmp_path, tag):
    port = _free_port()
    outs = [str(tmp_path / f"{tag}_{i}.json") for i in range(2)]
    procs = [_launch(port, i, outs[i]) for i in range(2)]
    for p in procs:
        assert p.wait(timeout=300) == 0
    return [json.load(open(o)) for o in outs]


def _golden():
    sys.path.insert(0, HERE)
    import mh_worker

    from stringsearchlib_tpu.config import IndexConfig
    from stringsearchlib_tpu.index.build import build_index
    from stringsearchlib_tpu.search.engine import SearchEngine

    host = build_index(mh_worker.WORDS, 1, None, IndexConfig())
    engine = SearchEngine(host)
    outs = engine.search_batch(mh_worker.QUERIES, 0.2, 10)
    return [[list(k), [round(float(x), 6) for x in s]] for k, s in outs]


@pytest.mark.slow
def test_two_process_parity(tmp_path):
    results = _run_pair(tmp_path, "pair")
    assert results[0]["ndev"] == 8
    assert results[0]["results"] == results[1]["results"]
    assert results[0]["results"] == _golden()


@pytest.mark.slow
def test_kill_one_host_midbatch_then_recover(tmp_path):
    port = _free_port()
    outs = [str(tmp_path / f"fault_{i}.json") for i in range(2)]
    hb = str(tmp_path / "hb")
    procs = [
        _launch(port, i, outs[i], loop=True, heartbeat=hb if i == 0 else "")
        for i in range(2)
    ]
    # wait until the pair is mid-work (heartbeat advancing), then kill
    deadline = time.time() + 240
    while time.time() < deadline and not os.path.exists(hb):
        if any(p.poll() not in (None, 0) for p in procs):
            pytest.fail("worker died before reaching steady state")
        time.sleep(0.5)
    assert os.path.exists(hb), "pair never reached steady state"
    procs[1].send_signal(signal.SIGKILL)  # exact child PID, never a pattern
    # the survivor is wedged in a collective against a dead peer: that IS
    # the failure mode; tear the job down like a supervisor would
    time.sleep(2)
    procs[0].kill()
    for p in procs:
        p.wait(timeout=60)

    # stateless recovery: fresh bring-up reproduces the golden results
    results = _run_pair(tmp_path, "recovered")
    assert results[0]["results"] == results[1]["results"]
    assert results[0]["results"] == _golden()
