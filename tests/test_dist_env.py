"""Distributed-launch env resolution (train.py resolve_dist_env): JAX_*
vars first, the reference's torch convention only as a COMPLETE launch,
stale leftovers ignored (reference train.py:482-551)."""

import train as train_cli


def test_jax_vars_win():
    coord, nproc, pid = train_cli.resolve_dist_env({
        "JAX_COORDINATOR_ADDRESS": "host0:1234",
        "JAX_NUM_PROCESSES": "4", "JAX_PROCESS_ID": "2",
        "MASTER_ADDR": "other", "WORLD_SIZE": "8", "RANK": "7",
    })
    assert (coord, nproc, pid) == ("host0:1234", 4, 2)


def test_complete_torch_style_launch():
    coord, nproc, pid = train_cli.resolve_dist_env({
        "MASTER_ADDR": "10.0.0.1", "MASTER_PORT": "29500",
        "WORLD_SIZE": "2", "RANK": "1",
    })
    assert (coord, nproc, pid) == ("10.0.0.1:29500", 2, 1)


def test_torch_default_port():
    coord, _, _ = train_cli.resolve_dist_env({
        "MASTER_ADDR": "10.0.0.1", "WORLD_SIZE": "2", "RANK": "0"})
    assert coord == "10.0.0.1:12355"


def test_stale_leftovers_do_not_override_autodetect():
    # MASTER_ADDR alone (torch leftover in .bashrc) -> full auto-detection
    assert train_cli.resolve_dist_env(
        {"MASTER_ADDR": "stale"}) == (None, None, None)
    # WORLD_SIZE/RANK without an address -> ignored too
    assert train_cli.resolve_dist_env(
        {"WORLD_SIZE": "4", "RANK": "0"}) == (None, None, None)
    assert train_cli.resolve_dist_env({}) == (None, None, None)
