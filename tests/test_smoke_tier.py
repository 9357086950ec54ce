"""Meta-test: the smoke tier's nodeids must track the suite.

conftest.py marks the ``SMOKE`` set centrally (one fast representative
per subsystem); a renamed or deleted test would silently shrink the
smoke tier. This scans the test sources for each referenced function so
drift fails loudly. Kept collection-free (plain file parsing) so it
costs milliseconds.
"""

import os
import re

from tests.conftest import SMOKE

HERE = os.path.dirname(os.path.abspath(__file__))


def test_every_smoke_nodeid_exists():
    missing = []
    for node in sorted(SMOKE):
        fname, test = node.split("::")
        path = os.path.join(HERE, fname)
        if not os.path.exists(path):
            missing.append(f"{node} (file gone)")
            continue
        src = open(path, encoding="utf-8").read()
        if not re.search(rf"^def {re.escape(test)}\(", src, re.M):
            missing.append(f"{node} (function gone)")
    assert not missing, f"stale SMOKE entries in conftest.py: {missing}"


def test_smoke_set_covers_major_subsystems():
    files = {n.split("::")[0] for n in SMOKE}
    for required in ("test_fbank.py", "test_ctc.py", "test_models.py",
                     "test_pipeline.py", "test_sharding.py",
                     "test_train.py", "test_http_server.py"):
        assert required in files, f"smoke tier lost {required}"
