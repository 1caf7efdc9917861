"""train_watchdog.sh process-tree contracts (shell logic regressions are
otherwise invisible to the suite): an external kill of the watchdog must
reap the training child — an orphaned python process would keep holding
the TPU through the next run."""

import os
import re
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WD = os.path.join(REPO, "scripts", "train_watchdog.sh")


def test_term_to_watchdog_reaps_child(tmp_path):
    proc = subprocess.Popen(
        ["bash", WD, str(tmp_path), "600", "1",
         sys.executable, "-c", "import time; time.sleep(300)"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
    # wait for the "started pid N" line, then TERM the watchdog itself
    line = ""
    for _ in range(100):
        line = proc.stdout.readline()
        if "started pid" in line:
            break
    m = re.search(r"started pid (\d+)", line)
    assert m, f"no child pid line: {line!r}"
    child = int(m.group(1))
    time.sleep(1)
    os.kill(proc.pid, signal.SIGTERM)
    proc.wait(timeout=60)
    assert proc.returncode == 143
    # the child must be gone (allow the trap's TERM->KILL ladder to finish)
    deadline = time.time() + 30
    while time.time() < deadline:
        try:
            os.kill(child, 0)
        except ProcessLookupError:
            return
        time.sleep(0.5)
    os.kill(child, signal.SIGKILL)  # cleanup before failing
    raise AssertionError(f"training child {child} survived the watchdog kill")
