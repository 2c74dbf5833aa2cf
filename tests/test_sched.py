"""Task queue semantics (sched/tasks.py): retry-on-error with a bounded
retry budget, callable and subprocess tasks, status table
(reference utils/TasksManager.py:116-311 behaviors)."""
import pytest

from brief_pytorch_tpu.sched.tasks import Queue, Task


def test_flaky_task_retries_then_finishes():
    attempts = {"n": 0}

    def flaky():
        attempts["n"] += 1
        if attempts["n"] < 3:
            raise RuntimeError("transient")
        return "ok"

    q = Queue([Task(flaky, "flaky")])
    q.start()
    assert attempts["n"] == 3
    assert len(q.finish_list) == 1 and not q.error_list
    assert q.finish_list[0].result == "ok"
    assert q.finish_list[0].ets == 2


def test_permanent_failure_lands_in_error_list():
    def bad():
        raise RuntimeError("always")

    q = Queue([Task(bad, "bad")], max_retries=2)
    q.start()
    assert not q.finish_list
    assert len(q.error_list) == 1
    assert q.error_list[0].ets == 3  # initial attempt + 2 retries


def test_subprocess_tasks_and_order():
    q = Queue([Task("true", "t_ok"), Task("false", "t_bad")], max_retries=0)
    q.start()
    assert [t.name for t in q.finish_list] == ["t_ok"]
    assert [t.name for t in q.error_list] == ["t_bad"]
    assert q.error_list[0].returncode != 0


def test_status_table_lists_all_tasks():
    q = Queue([Task("true", "alpha"), Task("true", "beta")])
    q.start()
    table = q.status_table()
    assert "alpha" in table and "beta" in table and "finish" in table


def test_max_task_runs_concurrently():
    import time as _time

    def slow():
        _time.sleep(0.5)
        return 1

    q = Queue([Task(slow, f"t{i}") for i in range(4)])
    t0 = _time.perf_counter()
    q.start(max_task=4)
    dt = _time.perf_counter() - t0
    assert len(q.finish_list) == 4 and not q.error_list
    assert dt < 1.5, dt   # serial would be ~2.0s


def test_retry_works_under_concurrency():
    attempts = {"n": 0}
    import threading
    lock = threading.Lock()

    def flaky():
        with lock:
            attempts["n"] += 1
            if attempts["n"] < 3:
                raise RuntimeError("transient")
        return "ok"

    q = Queue([Task(flaky, "flaky"), Task("true", "ok1"), Task("true", "ok2")])
    q.start(max_task=2)
    assert len(q.finish_list) == 3 and not q.error_list


def test_subprocess_tasks_pinned_to_distinct_devices(tmp_path):
    """The Queue pins each running subprocess to a device slot from
    device_list — appended as `-g <dev>` plus BRIEF_TPU_DEVICE, the way the
    reference Worker appends `-g <gpu>` (TasksManager.py:64).  Two
    concurrent tasks must see DIFFERENT devices."""
    out = tmp_path / "devs.txt"
    # each task records its device assignment (argv) and env, then waits
    # briefly so both run concurrently
    script = tmp_path / "child.py"
    script.write_text(
        "import sys, os, time\n"
        "with open(sys.argv[1], 'a') as f:\n"
        "    f.write(sys.argv[sys.argv.index('-g')+1] + ',' +\n"
        "            os.environ.get('BRIEF_TPU_DEVICE','?') + '\\n')\n"
        "time.sleep(0.4)\n")
    import sys
    tasks = [Task(f"{sys.executable} {script} {out}", f"t{i}")
             for i in range(2)]
    q = Queue(tasks, device_list=[0, 1])
    q.start(max_task=2, debug=True)
    lines = out.read_text().strip().splitlines()
    assert len(lines) == 2
    argv_devs = sorted(l.split(",")[0] for l in lines)
    env_devs = sorted(l.split(",")[1] for l in lines)
    assert argv_devs == ["0", "1"], lines
    assert env_devs == ["0", "1"], lines
    # slots are returned to the pool after completion
    assert all(t.device is None for t in tasks)


class TestTaskTimeout:
    def test_subprocess_timeout_kills_group_and_errors(self):
        """A hung child (observed: a task against a dead TPU worker blocks
        forever without erroring) is bounded by Task.timeout_s: the whole
        process group is killed, the task errors with 124, and the normal
        retry accounting applies."""
        import time

        from brief_pytorch_tpu.sched.tasks import Queue, Task
        t = Task("sleep 30", name="hung", timeout_s=1.0)
        q = Queue([t], max_retries=0)
        t0 = time.time()
        q.start()
        assert time.time() - t0 < 10
        assert t.status == "error" and t.returncode == 124
        assert q.error_list == [t]

    def test_subprocess_within_timeout_finishes(self):
        from brief_pytorch_tpu.sched.tasks import Queue, Task
        t = Task("true", name="fast", timeout_s=30.0)
        q = Queue([t])
        q.start()
        assert t.status == "finish" and t.returncode == 0
