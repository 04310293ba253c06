"""Run the real-TPU path tests in the worker process (the TPU holder)."""
import os, sys
os.environ["JDT_TPU_TESTS"] = "1"
sys.path.insert(0, "/root/repo")
import pytest
rc = pytest.main(["/root/repo/tests/test_tpu_paths.py", "-x", "-q",
                  "--no-header", "-p", "no:cacheprovider"])
print("TPU_PATH_TESTS_RC", rc, flush=True)
