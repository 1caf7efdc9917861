"""tqdm progress bars mirrored into the logbook.

Reference behavior (src/utils/progress_bar.py:12-158): a tqdm whose close-line
(final rate/desc) is emitted at the LOGBOOK level so the file log records
steps/sec per scale — the de-facto throughput metric.
"""

from __future__ import annotations

import logging

from tqdm import tqdm

from .logger import LOGBOOK_LEVEL, add_logging_level


class LogbookTqdm(tqdm):
    def __init__(self, *args, logging_on_update: bool = False,
                 logging_on_close: bool = True, **kwargs):
        add_logging_level("LOGBOOK", LOGBOOK_LEVEL)
        self._log_on_update = logging_on_update
        self._log_on_close = logging_on_close
        super().__init__(*args, **kwargs)

    def update(self, n=1):
        result = super().update(n)
        if self._log_on_update:
            logging.logbook(str(self))
        return result

    def close(self):
        if self._log_on_close and not self.disable:
            logging.logbook(str(self))
        super().close()


def create_progressbar(iterable=None, desc="", train=False, offset=0,
                       logging_on_update=False, logging_on_close=True,
                       postfix=False, **kwargs):
    return LogbookTqdm(iterable=iterable, desc=desc, position=offset,
                       logging_on_update=logging_on_update,
                       logging_on_close=logging_on_close,
                       dynamic_ncols=True, **kwargs)
