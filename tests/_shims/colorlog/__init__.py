"""Minimal colorlog shim so the torch reference (oracle) imports in tests.

Provides just ColoredFormatter as a plain logging.Formatter that drops the
color placeholders. Not part of the framework - test tooling only.
"""
import logging


class ColoredFormatter(logging.Formatter):
    def __init__(self, fmt=None, log_colors=None, **kwargs):
        if fmt is not None:
            for token in ("%(log_color)s", "%(reset)s"):
                fmt = fmt.replace(token, "")
        kwargs.pop("reset", None)
        kwargs.pop("secondary_log_colors", None)
        super().__init__(fmt=fmt, **{k: v for k, v in kwargs.items() if k in ("datefmt", "style")})
