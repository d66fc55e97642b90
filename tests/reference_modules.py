"""Import shim for executing the actual reference code in parity tests.

The reference (/root/reference/sd) is a flat directory whose modules import
each other by bare name (``from ddpm import DDPMSampler``, SURVEY §1), so it
must be on sys.path.  We append (not prepend) so the reference's generic
module names (clip, attention, pipeline, ...) can never shadow anything the
test suite or the package imports first.

Every test that uses these imports executes REAL reference code — unlike
tests/torch_oracle.py (a re-derivation), a passing test here proves parity
with the reference implementation itself.
"""

import os
import sys

REF_DIR = "/root/reference/sd"

available = os.path.isdir(REF_DIR)

if available and REF_DIR not in sys.path:
    sys.path.append(REF_DIR)


def load():
    """Import and return the reference modules (call under skipif guard)."""
    import attention as ref_attention  # noqa: F401
    import ddpm as ref_ddpm  # noqa: F401

    return ref_ddpm, ref_attention
