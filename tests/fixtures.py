"""Synthetic mini-BIDS fixture: a tiny standalone dataset for tests.

The builders live in the PACKAGED :mod:`fetalsyngen_tpu.testing` (so examples
and installed users get them too); this module re-exports them under the
historical test-local names.
"""

from fetalsyngen_tpu.testing import (  # noqa: F401
    FIXTURE_N_SUBCLASSES as N_SUBCLASSES,
    FIXTURE_SHAPE as SHAPE,
    FIXTURE_SUBJECTS as SUBJECTS,
    build_bids_tree,
    make_phantom,
)
