"""Driver entry-point contract tests."""

import jax
import pytest


@pytest.mark.slow
def test_dryrun_multichip_8():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


@pytest.mark.slow
def test_dryrun_multichip_2():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(2)


def test_entry_signature():
    """entry() must return (callable, args) without tracing the full model
    (we don't compile the 800x1216 R50 here — too slow on 1 CPU core)."""
    import inspect

    import __graft_entry__

    sig = inspect.signature(__graft_entry__.entry)
    assert len(sig.parameters) == 0
    assert callable(__graft_entry__.dryrun_multichip)
