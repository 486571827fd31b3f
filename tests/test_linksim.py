"""J6 golden cases ported verbatim from link_similarity.py:179-222."""

from __future__ import annotations

from searchengine_spark.pycore.linksim import (
    get_link_similarity,
    should_evaluate_url,
)

TOL = 0.01


def close(a, b):
    return abs(a - b) <= TOL


def test_get_link_similarity_goldens():
    u1 = "https://blogboard.io/blog/knowledge/python-print-to-stderr/"
    u2 = "https://blogboard.io/blog/knowledge/"
    assert close(get_link_similarity(u1, u1), 1.0)
    assert close(get_link_similarity(u1, u2), 0.66)
    assert close(
        get_link_similarity(
            u1, "https://www.youtube.com/results?search_query=reform+part+1"
        ),
        0.0,
    )
    assert close(
        get_link_similarity("https://sphinx.epic.com/hsch/", "https://epic.com/hsch"),
        0.0,
    )
    assert close(
        get_link_similarity(
            "https://wics.ics.uci.edu/events/category/wics-bonding/day/2013-08-22/",
            "https://wics.ics.uci.edu/events/category/wics-bonding/day/2013-08-23/",
        ),
        1.0,
    )


def test_should_evaluate_goldens():
    assert should_evaluate_url(
        "https://blogboard.io/blog/knowledge/python-print-to-stderr/",
        "https://blogboard.io/blog/knowledge/",
    )
    assert should_evaluate_url(
        "https://stackoverflow.com/questions/16712795/pass-arguments-from-cmd-to-python-script",
        "https://stackoverflow.com/questions/16712795",
    )
    assert not should_evaluate_url(
        "https://wics.ics.uci.edu/events/category/wics-bonding/day/2013-08-22/",
        "https://wics.ics.uci.edu/events/category/wics-bonding/day/2013-08-23/",
    )
