"""Dataset source plugins.

Same extension contract as the reference (utils.py:48-54, README.md:12-14):
a source named ``foo`` is a module ``source_foo`` exposing
``get_source()`` returning a duck-typed object with:

* attrs: ``num_classes, colors, lid2name, lname2id, num_train,
  num_valid, num_test, train_samples, valid_samples, test_samples``
* methods: ``load_trainval_data(data_dir, valid_fraction)``,
  ``load_test_data(data_dir)``

Sources bundled with this package are found first; arbitrary
``source_<name>.py`` modules on sys.path still work, so third-party
plugins written against the reference's contract drop in unchanged.
"""

from __future__ import annotations

import importlib


def load_data_source(data_source: str):
    """Load a data source by name (reference: utils.py:48-54)."""
    for modname in (
        f"ssd_tensorflow_tpu.data.source_{data_source}",
        f"source_{data_source}",
    ):
        try:
            module = importlib.import_module(modname)
        except ImportError:
            continue
        return module.get_source()
    raise ImportError(f"no data source module found for '{data_source}'")
