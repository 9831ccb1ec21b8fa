"""Compatibility shim: the tiny test model moved into the package as the
registered 'tiny' smoke arch."""

from dasac_tpu.nn.tiny import TinySeg  # noqa: F401
