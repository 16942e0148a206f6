"""Experiment-config channel: yaml -> namespace, reference schema.

The reference's third configuration mechanism (besides gym.make kwargs and
the ROS map yaml) is an experiment yaml loaded into an argparse Namespace
(examples/waypoint_follow.py:248-250; schema in
examples/config_example_map.yaml): map paths, start pose, raceline csv with
explicit column indices, controller gains / parameter bounds, optimization
budget, seed. This module reproduces that channel: every key in the yaml
becomes a Namespace attribute verbatim, relative paths resolve against the
yaml's own directory, and the raceline described by the wpt_* keys loads
with one call.
"""

from __future__ import annotations

import os
from argparse import Namespace

import numpy as np
import yaml


def load_experiment_config(path: str) -> Namespace:
    """Load an experiment yaml into a Namespace (reference convention).

    Adds ``_config_dir`` (the yaml's directory) so relative ``map_path`` /
    ``wpt_path`` entries can be resolved with :func:`resolve_path`.
    """
    with open(path) as f:
        conf = yaml.safe_load(f) or {}
    ns = Namespace(**conf)
    ns._config_dir = os.path.dirname(os.path.abspath(path))
    return ns


def resolve_path(conf: Namespace, p: str) -> str:
    """Resolve a config-relative path against the yaml's directory."""
    if os.path.isabs(p):
        return p
    return os.path.normpath(os.path.join(conf._config_dir, p))


def load_config_waypoints(conf: Namespace) -> np.ndarray:
    """Raceline described by the config's wpt_* keys -> (N, 3) [x, y, v].

    Honors wpt_path, wpt_delim, wpt_rowskip, wpt_xind, wpt_yind, wpt_vind
    (reference examples/config_example_map.yaml keys; missing keys fall
    back to the example_waypoints.csv schema).
    """
    from f1tenth_gym_tpu.utils.waypoints import load_waypoints

    return load_waypoints(
        resolve_path(conf, conf.wpt_path),
        delimiter=getattr(conf, "wpt_delim", ";"),
        skiprows=getattr(conf, "wpt_rowskip", 3),
        x_ind=getattr(conf, "wpt_xind", 1),
        y_ind=getattr(conf, "wpt_yind", 2),
        v_ind=getattr(conf, "wpt_vind", 5),
    )


def start_pose(conf: Namespace) -> np.ndarray:
    """(1, 3) start pose from the config's sx/sy/stheta keys."""
    return np.array([[conf.sx, conf.sy, conf.stheta]])
