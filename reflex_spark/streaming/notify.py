"""Insert notifiers: wake idle pollers the moment an append commits.

Reference parity (G4): the EventsNotifier/StreamWatcher pair
(rsql/eventstable.go:507-571) — ``Notify()`` is called on every insert,
and each stream client that reaches head obtains a one-shot channel
(``C()``) to block on instead of sleeping a blind backoff.

Spark translation: the notifier is in-process (exactly like the
reference's inmemNotifier — cross-process consumers rely on the poll
backoff as the fallback, in both systems). The win is twofold at scale:
head-poll latency drops from O(backoff) to O(notify), and an idle
consumer stops issuing a storage LIST + scan per backoff tick — on an
object store that is the difference between a hot metadata loop and a
parked thread.

Lost-wakeup safety: subscribe BEFORE loading the (possibly empty) batch,
wait AFTER observing it empty — an append landing between the load and
the wait sets the already-registered event, so the waiter wakes
immediately (the same ordering contract as the reference's
``ch := notifier.C()`` before the head re-check).
"""

from __future__ import annotations

import threading


class InMemNotifier:
    """In-memory fan-out notifier (reference inmemNotifier,
    rsql/eventstable.go:525-551): ``notify`` fires and clears all current
    one-shot subscriptions."""

    def __init__(self) -> None:
        self._mu = threading.Lock()
        self._listeners: list[threading.Event] = []
        self.notify_count = 0

    def subscribe(self) -> threading.Event:
        """Register a one-shot wakeup; call before re-checking head."""
        ev = threading.Event()
        with self._mu:
            self._listeners.append(ev)
        return ev

    def unsubscribe(self, ev: threading.Event) -> None:
        """Drop an unused subscription (a poller that found work does not
        wait; without this the listener list would grow unboundedly)."""
        with self._mu:
            try:
                self._listeners.remove(ev)
            except ValueError:
                pass  # already fired-and-cleared by notify()

    def notify(self) -> None:
        """Called by the log after an append commits."""
        with self._mu:
            listeners, self._listeners = self._listeners, []
            self.notify_count += 1
        for ev in listeners:
            ev.set()


class StubNotifier:
    """Notifier that never fires (reference stubNotifier): waiters always
    run out their timeout — i.e. plain poll-backoff behavior."""

    def subscribe(self) -> threading.Event:
        return threading.Event()

    def unsubscribe(self, ev: threading.Event) -> None:
        pass

    def notify(self) -> None:
        pass
