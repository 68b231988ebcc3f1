"""Full-screen terminal dashboard.

Role of poreplex/dashboard.py (urwid TUI with per-barcode mapping stats,
top-contig counts and progress): implemented on the stdlib ``curses``
module so it works without extra dependencies. Fed by the alignment writer
through ``feed_mapped`` with the same payload shape
(poreplex/alignment_writer.py:163-182 -> poreplex/dashboard.py:492-499).
"""

import asyncio
import time
from collections import defaultdict


def load_aliases(filename):
    """Tab-separated contig alias table (poreplex/dashboard.py:501-505)."""
    aliases = {}
    with open(filename) as f:
        for line in f:
            fields = line.rstrip('\n').split('\t')
            if len(fields) >= 2:
                aliases[fields[0]] = fields[1]
    return aliases


class ReadMappingStatistics:
    """Per-group mapped-contig counters (poreplex/dashboard.py:83-137)."""

    def __init__(self, aliases=None):
        self.aliases = aliases or {}
        self.counts = defaultdict(lambda: defaultdict(int))
        self.total = defaultdict(int)
        self.failed = defaultdict(int)
        self.unmapped = defaultdict(int)

    def feed(self, rescounts):
        for group, contigs in rescounts.get('mapped', {}).items():
            for contig in contigs:
                contig = self.aliases.get(contig, contig)
                self.counts[group][contig] += 1
                self.total[group] += 1
        for group, n in rescounts.get('failed', {}).items():
            self.failed[group] += n
        for group, n in rescounts.get('unmapped', {}).items():
            self.unmapped[group] += n

    def top_contigs(self, group, limit=50):
        items = sorted(self.counts[group].items(),
                       key=lambda kv: (-kv[1], kv[0]))
        return items[:limit]

    def groups(self):
        keys = (set(self.counts) | set(self.failed) | set(self.unmapped))
        return sorted(keys, key=lambda k: (k is None, k))


class DashboardView:

    def __init__(self, session, barcode_names, progress_stat, rate_stat,
                 analysis_delay, aliases):
        self.session = session
        self.barcode_names = barcode_names
        self.analysis_delay = analysis_delay
        self.stats = ReadMappingStatistics(aliases)
        self.started_at = time.time()
        self.selected_group = 0
        self._screen = None
        self._task = None
        self._stopped = False

    # ------------------------------------------------------------------
    def start(self, loop, will_align):
        import curses
        self._curses = curses
        self._screen = curses.initscr()
        curses.noecho()
        curses.cbreak()
        self._screen.nodelay(True)
        self._screen.keypad(True)
        self._task = loop.create_task(self._update_loop())

    def stop(self):
        if self._stopped:
            return
        self._stopped = True
        if self._task is not None:
            self._task.cancel()
        if self._screen is not None:
            curses = self._curses
            curses.nocbreak()
            self._screen.keypad(False)
            curses.echo()
            curses.endwin()
            self._screen = None

    def feed_mapped(self, rescounts):
        self.stats.feed(rescounts)

    # ------------------------------------------------------------------
    async def _update_loop(self):
        try:
            while not self._stopped:
                self._handle_keys()
                self._draw()
                await asyncio.sleep(0.5)
        except asyncio.CancelledError:
            pass

    def _handle_keys(self):
        ch = self._screen.getch()
        while ch != -1:
            if ch in (ord('q'), ord('Q')):
                self.session.stop('USER')
            elif ch == self._curses.KEY_LEFT:
                self.selected_group = max(0, self.selected_group - 1)
            elif ch == self._curses.KEY_RIGHT:
                self.selected_group += 1
            ch = self._screen.getch()

    def _draw(self):
        scr = self._screen
        sess = self.session
        scr.erase()
        maxy, maxx = scr.getmaxyx()

        elapsed = int(time.time() - self.started_at)
        header = (' Poreplex-TPU   elapsed {:02d}:{:02d}:{:02d}   '
                  'found {}  processed {}  queued {} '.format(
                      elapsed // 3600, elapsed // 60 % 60, elapsed % 60,
                      sess.reads_found, sess.reads_processed,
                      sess.reads_queued))
        scr.addnstr(0, 0, header.ljust(maxx - 1), maxx - 1,
                    self._curses.A_REVERSE)

        groups = self.stats.groups() or [None]
        self.selected_group = min(self.selected_group, len(groups) - 1)
        group = groups[self.selected_group]
        name = self.barcode_names.get(group, str(group))
        scr.addnstr(2, 1, 'Group: {}   (</> to switch, q to quit)'.format(
            name), maxx - 2)
        scr.addnstr(3, 1, 'mapped {}  unmapped {}  failed {}'.format(
            self.stats.total[group], self.stats.unmapped[group],
            self.stats.failed[group]), maxx - 2)

        scr.addnstr(5, 1, 'Top mapped contigs:', maxx - 2)
        row = 6
        for contig, cnt in self.stats.top_contigs(group,
                                                  limit=maxy - row - 1):
            scr.addnstr(row, 3, '{:8d}  {}'.format(cnt, contig), maxx - 4)
            row += 1
        scr.refresh()
