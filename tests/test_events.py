"""Event bus semantics (reference tests/test_publisher.py analog):
subscribe/unsubscribe, topic hierarchy, ALL_TOPICS, send hook."""

from invesalius3_tpu import events


def test_subscribe_and_send():
    bus = events.Publisher()
    got = []
    bus.subscribe(lambda **kw: got.append(kw), "a.b")
    bus.send_message("a.b", x=1)
    assert got == [{"x": 1}]


def test_topic_hierarchy():
    bus = events.Publisher()
    got = []
    bus.subscribe(lambda **kw: got.append("parent"), "a")
    bus.subscribe(lambda **kw: got.append("exact"), "a.b.c")
    bus.send_message("a.b.c")
    assert "parent" in got and "exact" in got


def test_all_topics():
    bus = events.Publisher()
    got = []
    bus.subscribe(events.wants_topic(lambda topic=None, **kw: got.append(topic)),
                  events.ALL_TOPICS)
    bus.send_message("x.y", v=2)
    bus.send_message("z")
    assert got == ["x.y", "z"]


def test_unsubscribe():
    bus = events.Publisher()
    got = []
    fn = lambda **kw: got.append(1)
    bus.subscribe(fn, "t")
    bus.send_message("t")
    bus.unsubscribe(fn, "t")
    bus.send_message("t")
    assert got == [1]


def test_duplicate_subscribe_fires_once():
    bus = events.Publisher()
    got = []
    fn = lambda **kw: got.append(1)
    bus.subscribe(fn, "t")
    bus.subscribe(fn, "t")
    bus.send_message("t")
    assert got == [1]


def test_send_hook_and_no_hook():
    """The remote-control mirror seam (reference pub.py:41-76)."""
    bus = events.Publisher()
    hooked = []
    bus.add_send_message_hook(lambda topic, kw: hooked.append((topic, kw)))
    bus.send_message("m", a=1)
    bus.send_message_no_hook("n", b=2)
    assert hooked == [("m", {"a": 1})]
    bus.remove_send_message_hook()
    bus.send_message("m2")
    assert len(hooked) == 1


def test_clear():
    bus = events.Publisher()
    got = []
    bus.subscribe(lambda **kw: got.append(1), "t")
    bus.clear("t")
    bus.send_message("t")
    assert got == []
