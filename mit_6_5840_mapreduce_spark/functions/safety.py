"""Codec error-contract enforcement.

Every ``decode_*`` in this package documents "malformed payload raises
ValueError" — but truncated buffers surface from ``struct.unpack_from``
as ``struct.error`` (not a ValueError subclass) and from slicing as
IndexError, which would escape a caller's ``except ValueError`` and kill
a whole Arrow batch instead of degrading one document (the
corrupt-container robustness multimodal._media_stats depends on).
This decorator normalizes those low-level parse failures to the
documented ValueError.
"""

from __future__ import annotations

import functools
import struct


def malformed_raises_valueerror(fn):
    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        try:
            return fn(*args, **kwargs)
        except (struct.error, IndexError) as e:
            raise ValueError(f"malformed container: {e}") from e
    return wrapped
