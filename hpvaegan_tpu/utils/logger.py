"""Console + logbook logging with indentation blocks.

Behavior parity with reference src/utils/logger.py:70-139 and
progress_bar.py:77-100: a custom LOGBOOK level (1000) that is console-
suppressed but file-logged, ANSI color stripping in the file handler, and a
LoggingBlock context manager that indents nested log sections.
"""

from __future__ import annotations

import io
import logging
import re

_ANSI_RE = re.compile(r"\x1b\[[0-9;]*m")
_indent_level = 0
LOGBOOK_LEVEL = 1000


def add_logging_level(level_name: str, level_num: int) -> None:
    """Register a custom logging level (reference: progress_bar.py:77-100)."""
    method_name = level_name.lower()
    if hasattr(logging, level_name):
        return
    logging.addLevelName(level_num, level_name)
    setattr(logging, level_name, level_num)

    def log_for_level(self, message, *args, **kwargs):
        if self.isEnabledFor(level_num):
            self._log(level_num, message, args, **kwargs)

    def log_to_root(message, *args, **kwargs):
        logging.log(level_num, message, *args, **kwargs)

    setattr(logging.getLoggerClass(), method_name, log_for_level)
    setattr(logging, method_name, log_to_root)


class _IndentFormatter(logging.Formatter):
    def __init__(self, fmt, strip_ansi=False):
        super().__init__(fmt, datefmt="%Y-%m-%d %H:%M:%S")
        self.strip_ansi = strip_ansi

    def format(self, record):
        msg = super().format(record)
        if self.strip_ansi:
            msg = _ANSI_RE.sub("", msg)
        return ("  " * _indent_level) + msg


def configure_logging(filename: str = None) -> None:
    """Console (INFO+, colors kept, LOGBOOK suppressed) + file logbook
    (everything, ANSI-stripped). Reference: logger.py:70-120.

    Also registers a SIGUSR1 faulthandler: `kill -USR1 <pid>` dumps every
    thread's Python stack to stderr without killing the process — the
    remote-TPU transport can wedge a process at init (observed round 3),
    and a live stack dump is the only way to localize it on a long run."""
    import faulthandler
    import signal

    try:
        faulthandler.register(signal.SIGUSR1, all_threads=True)
    except (AttributeError, ValueError, io.UnsupportedOperation):
        pass  # non-main thread or no usable stderr
    add_logging_level("LOGBOOK", LOGBOOK_LEVEL)
    root = logging.getLogger()
    root.setLevel(logging.DEBUG)
    root.handlers = []
    # keep third-party DEBUG chatter (jax tracing/compilation) out of the logbook
    for noisy in ("jax", "jax._src", "matplotlib", "PIL"):
        logging.getLogger(noisy).setLevel(logging.WARNING)

    console = logging.StreamHandler()
    console.setLevel(logging.INFO)
    console.addFilter(lambda rec: rec.levelno != LOGBOOK_LEVEL)
    console.setFormatter(_IndentFormatter("%(asctime)s %(message)s"))
    root.addHandler(console)

    if filename:
        fh = logging.FileHandler(filename)
        fh.setLevel(logging.DEBUG)
        fh.setFormatter(_IndentFormatter("%(asctime)s %(message)s", strip_ansi=True))
        root.addHandler(fh)


class LoggingBlock:
    """Indented log section (reference: logger.py:123-139)."""

    def __init__(self, title: str, emph: bool = False):
        self.title = title
        self.emph = emph

    def __enter__(self):
        global _indent_level
        if self.emph:
            logging.info("\x1b[1m%s\x1b[0m", self.title)
        else:
            logging.info("%s", self.title)
        _indent_level += 1
        return self

    def __exit__(self, *exc):
        global _indent_level
        _indent_level = max(0, _indent_level - 1)
        return False
