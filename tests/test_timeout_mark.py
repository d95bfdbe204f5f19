"""The conftest SIGALRM implementation of @pytest.mark.timeout is real
(VERDICT r3 weak #7: pytest-timeout is not installed, so the mark used to
be a silent no-op on the suite's hardest-to-debug test)."""

import time

import pytest


@pytest.mark.timeout(1)
def test_timeout_mark_fires():
    with pytest.raises(TimeoutError):
        time.sleep(8)


@pytest.mark.timeout(60)
def test_timeout_mark_clears():
    time.sleep(0.01)
