"""Structural checks on the transcribed paper-tuned hyperparameter tables
(tools/paper_tuned.py) and the runner's config construction."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.paper_tuned import FIXED, MODEL_DEFS, RANDOM
from tools.tuned_run import cell_config, split_entry

LOADABLE = {"cornell", "wisconsin", "texas", "film", "squirrel",
            "cora", "citeseer"}
GRID_LR = {0.002, 0.01, 0.05, 0.1}
GRID_WD = {0.0, 5e-6, 1e-5, 5e-5, 1e-4, 5e-4, 1e-3, 5e-3, 1e-2}


def _check_table(table):
    for mk, cells in table.items():
        assert mk in MODEL_DEFS, mk
        for ds, entry in cells.items():
            assert ds in LOADABLE, (mk, ds)
            hyper, mean, std = split_entry(entry)
            # all values come from the paper's published search grids
            assert hyper["lr"] in GRID_LR, (mk, ds, hyper["lr"])
            assert hyper["weight_decay"] in GRID_WD, (mk, ds)
            assert 0.0 <= hyper["dropout"] <= 0.9, (mk, ds)
            assert 0.0 < mean < 100.0 and 0.0 <= std < 20.0, (mk, ds)


def test_tables_well_formed():
    _check_table(RANDOM)
    _check_table(FIXED)


def test_cell_config_builds():
    for table, fixed in ((RANDOM, False), (FIXED, True)):
        for mk, cells in table.items():
            for ds, entry in cells.items():
                cfg = cell_config(mk, entry, fixed=fixed)
                assert cfg.fixed_splits is fixed
                assert cfg.num_splits == 10 and cfg.epochs == 1000
                assert cfg.model_type == MODEL_DEFS[mk]["model_type"]


def test_structure_info_only_for_gcnp_families():
    for table in (RANDOM, FIXED):
        for mk, cells in table.items():
            for ds, entry in cells.items():
                hyper, _, _ = split_entry(entry)
                if hyper.get("structure_info"):
                    assert MODEL_DEFS[mk]["model_type"] in (
                        "acmgcnp", "acmgcnpp"
                    ), (mk, ds)
