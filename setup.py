"""Legacy-path shim: the target container has setuptools but not
`wheel`, so the PEP 517 editable build (which shells out to
bdist_wheel) fails offline. `pip install -e . --no-build-isolation
--no-use-pep517` routes through this file's `setup.py develop`
instead, which needs neither wheel nor network. All metadata lives in
pyproject.toml; this file is only the offline editable-install path."""
from setuptools import setup

setup()
