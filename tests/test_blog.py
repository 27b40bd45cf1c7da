"""Blog routes (reference: routers/blog.py:316-384 + content/blog/):
markdown posts with YAML frontmatter rendered through the shared site
chrome, bilingual en/ru, Article structured data, 404 on unknown slugs."""

import asyncio

import pytest
from aiohttp.test_utils import TestClient, TestServer

EXPECTED_SLUGS = {"what-is-lufs", "podcast-mastering", "mastering-ai-music"}


@pytest.fixture()
def blog_app():
    from amw_tpu.runtime.service import create_app

    # A fresh app per test: aiohttp freezes an Application on first serve.
    return create_app(None)


def run(coro):
    return asyncio.get_event_loop_policy().new_event_loop() \
        .run_until_complete(coro)


def _get(app, path):
    async def inner():
        async with TestClient(TestServer(app)) as client:
            r = await client.get(path)
            return r.status, await r.text()
    return run(inner())


def test_posts_load():
    from amw_tpu.runtime.misc_routes import _load_posts

    posts = _load_posts()
    assert {p["slug"] for p in posts} >= EXPECTED_SLUGS
    for p in posts:
        assert p["date"] and p["en"]["title"] and p["ru"]["title"]
        assert p["en"]["title"] != p["ru"]["title"]  # genuinely localized
        assert len(p["en"]["body_md"]) > 500
        assert len(p["ru"]["body_md"]) > 500
        assert p["en"]["body_md"] != p["ru"]["body_md"]


def test_blog_index_lists_posts(blog_app):
    status, text = _get(blog_app, "/blog")
    assert status == 200
    for slug in EXPECTED_SLUGS:
        assert f'/blog/{slug}' in text
    # Shared site chrome + SEO metadata, like every other page.
    for needle in ('<header class="mm">', "mm.js", 'hreflang="ru"',
                   'property="og:title"', 'rel="canonical"'):
        assert needle in text, needle


def test_blog_index_ru(blog_app):
    status, text = _get(blog_app, "/blog?lang=ru")
    assert status == 200
    assert "Блог Magic Master" in text
    assert 'lang="ru"' in text


def test_blog_post_renders(blog_app):
    status, text = _get(blog_app, "/blog/what-is-lufs")
    assert status == 200
    assert "What is LUFS" in text
    assert "<h2" in text            # markdown actually rendered
    assert "<table>" in text        # tables extension active
    assert '"@type": "Article"' in text
    assert '<header class="mm">' in text


def test_blog_post_ru_variant(blog_app):
    status, text = _get(blog_app, "/blog/what-is-lufs?lang=ru")
    assert status == 200
    assert "Что такое LUFS" in text
    assert "What is LUFS? Loudness explained" not in text


def test_blog_unknown_slug_404(blog_app):
    status, _ = _get(blog_app, "/blog/no-such-post")
    assert status == 404


def test_blog_in_sitemap(blog_app):
    status, text = _get(blog_app, "/sitemap.xml")
    assert status == 200
    for slug in EXPECTED_SLUGS:
        assert f"/blog/{slug}</loc>" in text
