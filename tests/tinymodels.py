"""Compat shim: the tiny-geometry pipeline factory now lives in the package
(`streamvoiceanon_tpu.utils.tiny`) so the driver's multichip dryrun can use
it too.  Tests keep importing `tinymodels`."""

from streamvoiceanon_tpu.utils.tiny import (  # noqa: F401
    _random_arvc,
    tiny_config,
    tiny_converter,
)
