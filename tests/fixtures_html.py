"""Fixture HTML written from scratch to cover the same cases as the
reference's test corpus (/root/reference/tests/fixtures/board_list.html,
article_content.html, article_with_images.html and the table-driven cases in
ptt/ptt_test.go, ptt/parser_impl_test.go). Not copied — same semantics."""

BOARD_LIST = """
<!DOCTYPE html>
<html><body>
<div class="btn-group btn-group-paging">
  <a class="btn" href="/bbs/TestBoard/index1.html">最舊</a>
  <a class="btn" href="/bbs/TestBoard/index41.html">&lsaquo; 上頁</a>
  <a class="btn" href="/bbs/TestBoard/index43.html">下頁 &rsaquo;</a>
</div>
<div class="r-ent">
  <div class="nrec"><span class="hl f1">爆</span></div>
  <div class="title"><a href="/bbs/TestBoard/M.1700000001.A.AAA.html">[正妹] 超人氣</a></div>
  <div class="meta"><div class="author">alice</div></div>
</div>
<div class="r-ent">
  <div class="nrec"><span class="hl f2">99</span></div>
  <div class="title"><a href="/bbs/TestBoard/M.1700000002.A.BBB.html">  [分享] 風景照  </a></div>
  <div class="meta"><div class="author">bob</div></div>
</div>
<div class="r-ent">
  <div class="nrec"><span class="hl f0">X5</span></div>
  <div class="title"><a href="/bbs/TestBoard/M.1700000003.A.CCC.html">[問卦] 噓文多</a></div>
  <div class="meta"><div class="author">carol</div></div>
</div>
<div class="r-ent">
  <div class="nrec"></div>
  <div class="title"> (本文已被刪除) [deleted] </div>
  <div class="meta"><div class="author">-</div></div>
</div>
<div class="r-ent">
  <div class="nrec"><span>12</span></div>
  <div class="title"><a href="/bbs/TestBoard/M.1700000004.A.DDD.html">[公告] 板規</a></div>
  <div class="meta"><div class="author">mod</div></div>
</div>
</body></html>
"""

# expected from BOARD_LIST: 3 rows (deleted + 公告 skipped), in page order:
BOARD_LIST_EXPECTED = [
    {
        "title": "[正妹] 超人氣",
        "url": "https://www.ptt.cc/bbs/TestBoard/M.1700000001.A.AAA.html",
        "author": "alice",
        "push_rate": 100,
    },
    {
        "title": "[分享] 風景照",
        "url": "https://www.ptt.cc/bbs/TestBoard/M.1700000002.A.BBB.html",
        "author": "bob",
        "push_rate": 99,
    },
    {
        "title": "[問卦] 噓文多",
        "url": "https://www.ptt.cc/bbs/TestBoard/M.1700000003.A.CCC.html",
        "author": "carol",
        "push_rate": -5,
    },
]

ARTICLE_CONTENT = """
<!DOCTYPE html>
<html><body>
<div id="main-content" class="bbs-screen bbs-content">
  <div class="article-metaline">
    <span class="article-meta-tag">作者</span><span class="article-meta-value">alice (Alice)</span>
  </div>
  <div class="article-metaline">
    <span class="article-meta-tag">標題</span><span class="article-meta-value">[正妹] 測試文章標題</span>
  </div>
  大家好，這是正文開頭。
  <a href="https://i.imgur.com/first.jpg">https://i.imgur.com/first.jpg</a>
  中間一段文字。
  <a href="//cdn.example.com/second.png">第二張</a>
  <a href="http://pics.example.com/third.gif">third</a>
  <a href="https://imgur.com/gallery/test">gallery-no-ext</a>
  <a href="https://imgur.com/a/album123">album link (excluded)</a>
  <a href="https://example.com/file.pdf">not an image</a>
  <a href="https://example.com/photo.jpg?width=100">query string fails suffix</a>
  結尾文字。
</div>
</body></html>
"""

ARTICLE_CONTENT_TITLE = "[正妹] 測試文章標題"
ARTICLE_CONTENT_IMAGES = [
    "https://i.imgur.com/first.jpg",
    "https://cdn.example.com/second.png",
    "https://pics.example.com/third.gif",
    "https://imgur.com/gallery/test.jpg",
]

ARTICLE_WITH_DUP_IMAGES = """
<html><body><div id="main-content">
<div class="article-metaline"><span class="article-meta-tag">標題</span><span class="article-meta-value">dup test</span></div>
<a href="https://i.imgur.com/x.jpg">x</a>
<a href="https://i.imgur.com/y.png">y</a>
<a href="https://i.imgur.com/x.jpg">x again</a>
</div></body></html>
"""

NO_PAGING_HTML = "<html><body><div class='r-ent'></div></body></html>"
BAD_PAGE_HTML = """
<html><body><div class="btn-group-paging">
<a href="/bbs/B/oops.html">&lsaquo; 上頁</a></div></body></html>
"""
