class InitializationFailedError(RuntimeError):
    """Scenario initialization failed (ref: `behavior/common.py:1`)."""
