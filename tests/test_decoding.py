"""Decode precedence tests — atra/src/decoding/mod.rs:83-257 semantics."""

import codecs

from atra_ray.functions.decoding import decode_bytes, meta_charsets, whatwg_codec


def test_meta_charset_wins():
    body = '<html><head><meta charset="iso-8859-1"></head><body>caf\xe9</body></html>'.encode("cp1252")
    text, enc, err = decode_bytes(body, is_html=True)
    assert enc == "cp1252"  # WHATWG: iso-8859-1 label -> windows-1252
    assert "café" in text
    assert not err


def test_meta_charset_with_errors_is_rejected():
    # declared charset produces replacement chars -> falls through to utf-8
    body = '<html><head><meta charset="shift_jis"></head><body>ok</body></html>'.encode("utf-8")
    # inject a byte sequence invalid in shift_jis but valid utf-8
    body = body.replace(b"ok", "ありがとう".encode("utf-8"))
    text, enc, err = decode_bytes(body, is_html=True)
    assert "ありがとう" in text
    assert not err


def test_bom_utf16le():
    body = codecs.BOM_UTF16_LE + "<html><body>héllo</body></html>".encode("utf-16-le")
    text, enc, err = decode_bytes(body, is_html=True)
    assert enc == "utf-16-le"
    assert "héllo" in text
    assert not err


def test_bom_utf8():
    body = codecs.BOM_UTF8 + "plain".encode()
    text, enc, err = decode_bytes(body, is_html=False)
    assert text == "plain"
    assert not err


def test_invalid_utf8_lossy_fallback():
    body = b"<html><body>a\xffb</body></html>"
    text, enc, err = decode_bytes(body, is_html=True)
    assert enc == "utf-8"
    assert err
    assert "a�b" in text


def test_clean_utf8_no_errors():
    text, enc, err = decode_bytes("héllo wörld".encode(), is_html=False)
    assert (text, enc, err) == ("héllo wörld", "utf-8", False)


def test_whatwg_label_table():
    assert whatwg_codec("ISO-8859-1") == "cp1252"
    assert whatwg_codec("UTF-8") == "utf-8"
    assert whatwg_codec("Shift-JIS") == "shift_jis"
    assert whatwg_codec("nonsense") is None


def test_meta_charsets_scan_order():
    body = b'<meta charset="utf-8"><meta http-equiv="Content-Type" content="text/html; charset=iso-8859-1">'
    assert meta_charsets(body) == ["utf-8", "iso-8859-1"]


def test_empty_body():
    assert decode_bytes(b"", is_html=True) == (None, "none", False)
    assert decode_bytes(None, is_html=True) == (None, "none", False)


def test_statistical_guess_cp1251_vs_koi8r():
    from atra_ray.functions.decoding import statistical_guess

    ru = "данные поиск страница и в не на я быть он с что система"
    body = f"<html><body><p>{ru}</p></body></html>".encode("cp1251")
    assert statistical_guess(body) == "cp1251"
    body_koi = f"<html><body><p>{ru}</p></body></html>".encode("koi8-r")
    assert statistical_guess(body_koi) == "koi8-r"


def test_statistical_guess_cjk():
    from atra_ray.functions.decoding import statistical_guess

    jp = "データ の 検索 ページ に 情報 を サイト"
    assert statistical_guess(jp.encode("euc_jp")) == "euc_jp"
    assert statistical_guess(jp.encode("shift_jis")) == "shift_jis"
    zh = "数据 搜索 页面 的 是 在 了 有 和 网站 结果"
    assert statistical_guess(zh.encode("gb18030")) == "gb18030"


def test_statistical_guess_refuses_weak_evidence():
    from atra_ray.functions.decoding import statistical_guess

    # one stray 0xFF in mostly-ASCII text: refuse (lossy UTF-8 wins,
    # matching the fixture contract for utf-8-invalid pages)
    body = b"mostly ascii text " * 20 + b"Q\xffq" + b" more ascii " * 20
    assert statistical_guess(body) is None


def test_statistical_guess_tld_hint():
    from atra_ray.functions.decoding import statistical_guess

    # short ambiguous Cyrillic: the .ru hint must still land on a Cyrillic
    # codec (hint adds a bonus, never forces an invalid decode)
    ru = "привет мир"
    got = statistical_guess(ru.encode("cp1251"), tld="ru")
    assert got in ("cp1251", "koi8-r")
    assert ru.encode("cp1251").decode(got) is not None


def test_decode_bytes_statistical_path():
    from atra_ray.functions.decoding import decode_bytes

    ru = "данные поиск страница и в не на я быть он с что система"
    html = f"<html><head></head><body><p>{ru}</p></body></html>"
    text, enc, err = decode_bytes(html.encode("cp1251"), is_html=True)
    assert enc == "cp1251" and not err and ru in text


def test_language_script_detection():
    from atra_ray.functions.langdetect import detect_language_info

    lang, script, conf = detect_language_info("данные поиск и в не на что")
    assert (lang, script) == ("rus", "cyrillic")
    assert detect_language_info("データ の 検索 ページ")[0] == "jpn"
    assert detect_language_info("数据 搜索 页面 的 是")[0] == "cmn"
    assert detect_language_info("한국어 텍스트 예시 입니다")[0] == "kor"
    lang, script, conf = detect_language_info("the search engine and the data")
    assert (lang, script) == ("eng", "latin") and conf > 0
    # han + kana = Japanese even when han dominates
    assert detect_language_info("検索結果情報画像の")[0] == "jpn"


def test_guess_decode_never_raises_past_sample():
    """ADVICE r2 (high): a byte invalid in the guessed codec PAST the 64KB
    validation sample must not raise out of decode_bytes — the reference's
    chardetng path never raises. The decode stays with the guessed codec,
    lossy, with had_errors set."""
    from atra_ray.functions.decoding import decode_bytes

    ru = "данные поиск страница и в не на я быть он с что система "
    body = (ru * 2500).encode("cp1251")  # ~130 KB, clean cp1251
    assert len(body) > 70_000
    body = body[:100_000] + b"\x98" + body[100_000:]  # 0x98 undefined in cp1251
    text, enc, err = decode_bytes(body, is_html=False)
    assert enc == "cp1251" and err
    assert "данные" in text and "�" in text


def test_statistical_guess_sample_boundary_trim():
    """ADVICE r2 (low): a multibyte char cut by the sample window must not
    strict-disqualify the true CJK codec."""
    from atra_ray.functions.decoding import decode_bytes, statistical_guess

    jp = "データ検索ページ情報サイト"
    body = b"a" + (jp * 3000).encode("euc_jp")  # every char straddles odd offsets
    assert len(body) > 65536
    assert statistical_guess(body) == "euc_jp"
    text, enc, err = decode_bytes(body, is_html=False)
    assert enc == "euc_jp" and not err and "データ" in text


def test_language_id_expanded_coverage():
    """30-language trigram coverage (M17, whatlang-grade breadth for the
    Latin/Cyrillic families): adversarial everyday-prose snippets NOT
    drawn from the profile texts, including the confusable pairs
    (dan/nob/swe, ces/slk, hrv/slv/srp, rus/ukr/bel/bul)."""
    from atra_ray.functions.langdetect import detect_language_info

    snippets = {
        "ron": "copiii se jucau în grădină în timp ce părinții lor îi priveau",
        "fin": "lapset leikkivät pihalla ja vanhemmat katsoivat heitä ikkunasta",
        "dan": "børnene legede i haven mens deres forældre så på dem",
        "nob": "barna lekte i hagen mens foreldrene deres så på dem",
        "swe": "barnen lekte i trädgården medan deras föräldrar tittade på",
        "hun": "a gyerekek a kertben játszottak míg a szüleik nézték őket",
        "tur": "çocuklar bahçede oynuyordu ve aileleri onları izliyordu",
        "cat": "els nens jugaven al jardí mentre els seus pares els miraven",
        "hrv": "djeca su se igrala u vrtu dok su ih roditelji promatrali",
        "slk": "deti sa hrali v záhrade zatiaľ čo ich rodičia sa pozerali",
        "slv": "otroci so se igrali na vrtu medtem ko so jih starši opazovali",
        "ces": "děti si hrály na zahradě zatímco jejich rodiče se dívali",
        "ind": "anak anak bermain di kebun sementara orang tua mereka mengawasi",
        "vie": "bọn trẻ đang chơi ngoài vườn trong khi bố mẹ chúng theo dõi",
        "est": "lapsed mängisid aias sel ajal kui nende vanemad vaatasid",
        "lav": "bērni spēlējās dārzā kamēr viņu vecāki viņus vēroja",
        "lit": "vaikai žaidė sode o jų tėvai juos stebėjo pro langą",
        "bul": "децата играеха в градината а родителите им ги гледаха",
        "srp": "деца су се играла у дворишту док су их родитељи гледали",
        "bel": "дзеці гулялі ў садзе а іх бацькі назіралі за імі",
        "ukr": "діти гралися в саду а їхні батьки спостерігали за ними",
        "rus": "дети играли в саду а их родители наблюдали за ними",
    }
    misses = {}
    for lang, text in snippets.items():
        got, _, _ = detect_language_info(text)
        if got != lang:
            misses[lang] = got
    assert not misses, misses


def test_vietnamese_script_and_language():
    """Latin Extended Additional must count as Latin at the script layer
    (kept in sync with the trigram LUT) — diacritic-heavy Vietnamese
    resolves to vie, not und."""
    from atra_ray.functions.langdetect import detect_language_info, detect_script

    text = "những đứa trẻ được đặt ở đấy đã lớn lên cùng với ổi và mận"
    script, n, total = detect_script(text)
    assert script == "latin" and n == total and n > 30
    assert detect_language_info(text)[0] == "vie"


def test_language_id_whatlang_parity_coverage():
    """Round-4 breadth (M17 → whatlang's 69-language inventory):
    adversarial everyday-prose snippets NOT drawn from the profile texts
    or the fixture pools, covering every new trigram-family language
    (incl. the confusable pairs ara/pes/urd, hin/mar/nep, heb/yid,
    mkd-vs-srp/bul, afr-vs-nld, aze/tuk-vs-tur) and every new
    single-script direct map."""
    from atra_ray.functions.langdetect import ALL_LANGS, detect_language_info

    assert len(ALL_LANGS) == 69  # whatlang parity
    snippets = {
        "epo": "la infanoj ludis en la ĝardeno dum iliaj gepatroj rigardis ilin",
        "aze": "uşaqlar bağçada oynayırdılar və valideynləri onlara baxırdılar",
        "uzb": "bolalar bogʻda oʻynashardi ota onalari esa ularni kuzatib turishardi",
        "tgl": "naglalaro ang mga bata sa hardin habang pinapanood sila ng kanilang mga magulang",
        "tuk": "çagalar bagda oýnaýardylar ene atalary bolsa olara seredýärdiler",
        "jav": "bocah bocah padha dolanan ing kebon nalika wong tuwane nonton",
        "aka": "mmofra no redi agorɔ wɔ turo no mu na wɔn awofo hwɛ wɔn",
        "zul": "izingane zazidlala engadini kanti abazali bazo babezibukele",
        "sna": "vana vaitamba mubindu apo vabereki vavo vakanga vakavatarisa",
        "afr": "die kinders het in die tuin gespeel terwyl hulle ouers na hulle gekyk het",
        "lat": "pueri in horto ludebant dum parentes eos spectabant",
        "mkd": "децата си играа во градината додека нивните родители ги гледаа",
        "ara": "كان الأطفال يلعبون في الحديقة بينما كان والداهم يراقبونهم",
        "pes": "بچه ها در باغ بازی می کردند در حالی که پدر و مادرشان آنها را تماشا می کردند",
        "urd": "بچے باغ میں کھیل رہے تھے جبکہ ان کے والدین انہیں دیکھ رہے تھے",
        "hin": "बच्चे बगीचे में खेल रहे थे जबकि उनके माता पिता उन्हें देख रहे थे",
        "mar": "मुले बागेत खेळत होती आणि त्यांचे आई वडील त्यांना पाहत होते",
        "nep": "केटाकेटीहरू बगैंचामा खेलिरहेका थिए भने उनीहरूका आमाबुबाले हेरिरहेका थिए",
        "heb": "הילדים שיחקו בגינה בזמן שההורים שלהם הסתכלו עליהם",
        "yid": "די קינדער האבן זיך געשפילט אין גארטן בשעת זייערע עלטערן האבן צוגעקוקט",
        "ell": "τα παιδιά έπαιζαν στον κήπο ενώ οι γονείς τους τα κοιτούσαν",
        "tha": "เด็ก ๆ กำลังเล่นอยู่ในสวนขณะที่พ่อแม่ของพวกเขาเฝ้าดู",
        "kor": "아이들이 정원에서 놀고 있었고 부모님이 지켜보고 있었다",
        "hye": "երեխաները խաղում էին այգում մինչ նրանց ծնողները նայում էին",
        "ben": "বাচ্চারা বাগানে খেলছিল আর তাদের বাবা মা তাদের দেখছিলেন",
        "pan": "ਬੱਚੇ ਬਾਗ ਵਿੱਚ ਖੇਡ ਰਹੇ ਸਨ ਜਦੋਂ ਉਨ੍ਹਾਂ ਦੇ ਮਾਪੇ ਦੇਖ ਰਹੇ ਸਨ",
        "guj": "બાળકો બગીચામાં રમતા હતા જ્યારે તેમના માતાપિતા તેમને જોતા હતા",
        "ori": "ପିଲାମାନେ ବଗିଚାରେ ଖେଳୁଥିଲେ ଏବଂ ସେମାନଙ୍କ ବାପାମାଆ ଦେଖୁଥିଲେ",
        "tam": "குழந்தைகள் தோட்டத்தில் விளையாடிக் கொண்டிருந்தனர் அவர்களின் பெற்றோர் பார்த்துக் கொண்டிருந்தனர்",
        "tel": "పిల్లలు తోటలో ఆడుకుంటున్నారు వారి తల్లిదండ్రులు చూస్తున్నారు",
        "kan": "ಮಕ್ಕಳು ತೋಟದಲ್ಲಿ ಆಡುತ್ತಿದ್ದರು ಅವರ ಪೋಷಕರು ನೋಡುತ್ತಿದ್ದರು",
        "mal": "കുട്ടികൾ തോട്ടത്തിൽ കളിക്കുകയായിരുന്നു അവരുടെ മാതാപിതാക്കൾ നോക്കിയിരുന്നു",
        "sin": "ළමයි වත්තේ සෙල්ලම් කරමින් සිටියා ඔවුන්ගේ දෙමාපියන් බලා සිටියා",
        "mya": "ကလေးတွေက ဥယျာဉ်ထဲမှာ ဆော့နေကြပြီး မိဘတွေက ကြည့်နေကြတယ်",
        "kat": "ბავშვები ბაღში თამაშობდნენ სანამ მათი მშობლები უყურებდნენ",
        "amh": "ልጆቹ በአትክልቱ ውስጥ ይጫወቱ ነበር ወላጆቻቸውም ይመለከቱ ነበር",
        "khm": "ក្មេងៗកំពុងលេងនៅក្នុងសួនខណៈពេលដែលឪពុកម្តាយរបស់ពួកគេមើល",
    }
    misses = {}
    for lang, text in snippets.items():
        got, _, _ = detect_language_info(text)
        if got != lang:
            misses[lang] = got
    assert not misses, misses
