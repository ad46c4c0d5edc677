"""Shim for legacy tooling; configuration lives in pyproject.toml.

The reference assembles its wheel by copying vendored submodules into a flat
layout (reference: build.sh:5-24, setup.py:20-38). This package has no
vendored deps — everything is first-party — so standard setuptools suffices.
"""

from setuptools import setup

setup()
