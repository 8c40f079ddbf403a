"""CLI command tree (rebuilds run.py / experiments/__init__.py):

{regression|reg} x {train|tr, test|ts, find|fd}
{classification|cls} x {train|tr, test|ts}
{ensemble|ens} x {train|tr, test|ts}
"""

from snngp.cli import regression
from snngp.cli import classification
from snngp.cli import ensemble


def add_subparser(subparsers):
    classification.add_subparser(subparsers)
    regression.add_subparser(subparsers)
    ensemble.add_subparser(subparsers)
