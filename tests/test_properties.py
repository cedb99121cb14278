"""Property-based tests (hypothesis) for the pure URL kernels — the
reference's own depth/ordering unit tests (url/url_with_depth.rs:298-389)
generalized over generated inputs."""

from hypothesis import given, settings
from hypothesis import strategies as st

from atra_ray.functions.links import pack_link
from atra_ray.functions.urlkit import Depth, canonicalize, origin_of

_seg = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Nd"), max_codepoint=127),
    min_size=1,
    max_size=10,
)


@st.composite
def _urls(draw):
    host = draw(_seg) + ".example"
    path = "/" + "/".join(draw(st.lists(_seg, max_size=3)))
    frag = draw(st.one_of(st.just(""), st.just("#x"), st.just("#frag")))
    query = draw(st.one_of(st.just(""), st.just("?a=1")))
    return f"https://{host}{path}{query}{frag}"


@settings(max_examples=200, deadline=None)
@given(_urls())
def test_canonicalize_idempotent_and_fragment_free(url):
    c = canonicalize(url)
    assert c is not None
    assert "#" not in c  # fragment always stripped (url_with_depth.rs:44-47)
    assert canonicalize(c) == c  # idempotent


@settings(max_examples=200, deadline=None)
@given(_urls(), _urls())
def test_depth_propagation_rule(base, raw):
    """same host → dow+1, dts same; host change → dow=0, dts+1; tds always
    +1 (url_with_depth.rs:69-110)."""
    base = canonicalize(base)  # crawl flow precondition: bases are canonical
    d0 = Depth(2, 1, 3)
    packed = pack_link(base, d0, raw)
    if canonicalize(raw) == base:
        assert packed is None  # self-links are dropped
        return
    assert packed is not None
    target, d, kind = packed
    assert d.tds == d0.tds + 1
    if origin_of(target) == origin_of(base):
        assert d.dow == d0.dow + 1 and d.dts == d0.dts
    else:
        assert d.dow == 0 and d.dts == d0.dts + 1


@settings(max_examples=100, deadline=None)
@given(_urls())
def test_origin_is_host_cased(url):
    o = origin_of(url)
    assert o is not None and o == o.lower()
    assert o in url.lower()
