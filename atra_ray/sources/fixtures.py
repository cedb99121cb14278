"""Deterministic synthetic Common-Crawl-style fixture generator (FIXTURES.md).

Replaces the reference's canned url→response fixtures
(atra/src/test_impls/, atra/testdata/samples/) with a generated Parquet
corpus whose oracle columns are known **by construction** — the generator
composes each page from known text paragraphs and known link targets, then
renders the HTML and encodes it; the engine must decode + extract its way
back to exactly those bytes. Nothing here calls engine extraction code, so
the oracle is independent of the implementation under test.

Tables written to ``<out_dir>/``:
  pages.parquet        url, warc_ts:timestamp[us], html:binary, text, lang
                       (exactly BASELINE.json's input_hint schema; ``text``
                       and ``lang`` are the oracle columns)
  links_oracle.parquet url, target, origin, kind  — expected extraction
                       under the default ExtractionConfig
  seeds.parquet / seeds.txt   seed URLs (one per seed host)
  robots.parquet       host, robots_txt:binary (missing rows = no robots)

Everything derives from ``random.Random(int)`` seeded with pure-integer
mixes of (GLOBAL_SEED, host, page) — stable across processes and platforms.
"""

from __future__ import annotations

import codecs
import json
import os
import random
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

GLOBAL_SEED = 42
GENERATOR_VERSION = "21"  # v21: cookie-wall hosts + world-language pages  # bump when generation rules change (invalidates caches)
EPOCH_US = 1_729_036_800_000_000  # 2024-10-16T00:00:00Z in microseconds

_LANGS = (
    "eng", "deu", "fra", "spa", "ita", "nld", "swe", "pol",
    # round-3 additions exercising the widened 30-language detector on
    # orthographically distinctive families (agglutinative + Romanian)
    "fin", "tur", "hun", "ron",
)

# Per-language word pools — the generator's OWN vocabulary, deliberately
# independent of functions/langdetect.py's PROFILE_TEXT training prose
# (VERDICT r2 item 4: the fixture↔detector circularity is broken; the
# detector must classify these pools from orthography alone). Function
# words overlap between the two sides only because that is what the
# language IS.
_CONTENT = {
    "eng": "the and with from under between house garden river mountain "
           "bread water morning evening friend street market people would "
           "never always other during three night light stone through "
           "should because think which things something".split(),
    "deu": "und der das die mit von unter zwischen haus garten fluss berg "
           "brot wasser morgen abend freund markt leute niemals immer "
           "andere während über drei nacht licht stein weg".split(),
    "fra": "et le la les des avec sous entre maison jardin rivière "
           "montagne pain eau matin soir ami rue marché gens jamais "
           "toujours autres pendant trois nuit lumière pierre chemin".split(),
    "spa": "y el la los las con bajo entre casa jardín río montaña pan "
           "agua mañana tarde amigo calle mercado gente nunca siempre "
           "otros durante tres noche luz piedra camino".split(),
    # che/non function words + più/perché/già: short salads carry
    # distinctly Italian evidence (cat/spa share il/la/con)
    "ita": "e il che non la gli con sotto tra casa giardino fiume "
           "montagna pane acqua mattina sera amico strada mercato gente "
           "mai sempre altri durante tre notte luce pietra cammino più "
           "perché già degli questo".split(),
    "nld": "en de het een met van onder tussen huis tuin rivier berg "
           "brood water ochtend avond vriend straat markt mensen nooit "
           "altijd andere tijdens drie nacht licht steen weg".split(),
    "swe": "och det en ett med av under mellan hus trädgård flod berg "
           "bröd vatten morgon kväll vän gata marknad människor aldrig "
           "alltid andra tre natt ljus sten väg".split(),
    "pol": "i w na to z pod między dom ogród rzeka góra chleb woda rano "
           "wieczór przyjaciel ulica rynek ludzie nigdy zawsze inni "
           "podczas trzy noc światło kamień droga".split(),
    "fin": "ja on ei se että mutta talo puutarha joki vuori leipä vesi "
           "aamu ilta ystävä katu tori ihmiset koskaan aina muut kolme "
           "yö valo kivi tie".split(),
    # diacritic-dense pool: 32-word salads must always carry ğ/ş/ç/ı/ü
    # evidence (verified: 0 misclassifications over 2000 seeded salads)
    "tur": "ve bir bu da ile altında arasında ev bahçe nehir dağ ekmek "
           "su sabah akşam arkadaş sokak pazar insanlar şehir güneş "
           "ağaç çiçek köprü yıldız gece ışık taş yol üç".split(),
    "hun": "és a az egy alatt között ház kert folyó hegy kenyér víz "
           "reggel este barát utca piac emberek soha mindig mások három "
           "éjszaka fény kő út".split(),
    # să/că function words: every salad carries ă/ș/ț evidence (0 misses
    # over 6000 seeded salads at 18 and 32 words)
    "ron": "și să că cu un sub între casă grădină râu munte pâine apă "
           "dimineață seară prieten stradă piață oameni niciodată mereu "
           "alții trei noapte lumină piatră drum țară pădure vânt câmp".split(),
    # native-script pools for the no-meta/no-BOM statistical-detection
    # pages (M9 step 4): the detector must identify these from CONTENT
    # alone. ces (cp1250) and ukr (koi8-u) also exercise the widened
    # statistical-candidate set.
    # ě/ř/ů-rich (letters Slovak orthography lacks): short cp1250 pages
    # must never tip into slk
    "ces": "a že ještě před v na s pod mezi dům zahrada řeka hora chléb "
           "voda ráno večer přítel ulice trh lidé nikdy vždy jiní během "
           "tři noc světlo kámen cesta děti město může stůl těžký "
           "předtím".split(),
    "rus": "и в не на с под между дом сад река гора хлеб вода утро вечер "
           "друг улица рынок люди никогда всегда другие три ночь свет "
           "камень дорога".split(),
    "ukr": "і в не на з під між дім сад річка гора хліб вода ранок вечір "
           "друг вулиця ринок люди ніколи завжди інші три ніч світло "
           "камінь дорога".split(),
    "jpn": "データ 検索 ページ クローラ 情報 サイト 結果 画像 言葉 索引 "
           "の に は を が で て と から まで".split(),
    "cmn": "数据 搜索 页面 网络 文本 词语 网站 结果 索引 图片 "
           "的 是 在 了 有 和 这 中 大 为".split(),
    # ---- round-4 world-language pools (whatlang-parity corpus). Leading
    # 4 words are the function words _words() re-draws every 3rd token.
    # Latin-script trigram family:
    "epo": "kaj la ĉe pri domo ĝardeno rivero monto pano akvo mateno "
           "vespero amiko strato foiro homoj neniam ĉiam aliaj ankaŭ "
           "nokto lumo ŝtono vojo arbo floro ponto stelo hodiaŭ ĉielo "
           "montoj stratoj preĝejo urboj manĝaĵo trinkaĵo aĵoj tagiĝo "
           "baldaŭ apenaŭ ĝojo paĝoj".split(),
    "aze": "və ilə görə əgər ev bağça çay dağ çörək su səhər axşam "
           "dost küçə bazar adamlar həmişə başqaları üç gecə işıq daş "
           "yol ağac gül körpü ulduz səma dəniz gözəl böyük təzə "
           "əvvəl dənizdə gələn şəhər".split(),
    "uzb": "va bir bu bilan uy bogʻ daryo togʻ non suv ertalab "
           "kechqurun doʻst koʻcha bozor odamlar doimo boshqalar uch "
           "tun yorugʻlik tosh yoʻl daraxt gul koʻprik yulduz osmon "
           "dengiz qishloq yaxshi oʻgʻil togʻlar".split(),
    "tgl": "ang ng mga sa at ay na bahay hardin ilog bundok tinapay "
           "tubig umaga gabi kaibigan kalye palengke tao palagi iba "
           "tatlo liwanag bato daan puno bulaklak tulay bituin hindi".split(),
    "tuk": "bilen üçin bolsa ýaly öý baglar derýa daglar çörek suw "
           "ertir agşam dost köçe bazar adamlar elmydama başgalar üç "
           "gije ýagtylyk daş ýol agaç gül köpri ýyldyz asman deňiz "
           "ýagty daňdan şäher öýleri giň uzyn gyzyl".split(),
    "jav": "lan ing sing karo omah kebon kali gunung roti banyu esuk "
           "bengi kanca dalan pasar wong tansah liyane telu wengi "
           "cahya watu wit kembang kreteg lintang langit segara iku "
           "saka ora".split(),
    "aka": "na wɔ no a ofie turo asubɔnten bepɔw paanoo nsu anɔpa "
           "anwummere adamfo abɔnten gua nnipa daa afoforo abiɛsa "
           "anadwo hann ɔbo kwan dua nhwiren asuogya nsoromma wim "
           "ɛpo yɛ sɛ".split(),
    "zul": "futhi nge ku la indlu ingadi umfula intaba isinkwa amanzi "
           "ekuseni kusihlwa umngane umgwaqo imakethe abantu njalo "
           "abanye kuthathu ubusuku ukukhanya itshe indlela isihlahla "
           "imbali ibhuloho inkanyezi isibhakabhaka ulwandle ngoba "
           "lapho".split(),
    "sna": "uye pa ku ne imba bindu rwizi gomo chingwa mvura "
           "mangwanani manheru shamwari mugwagwa musika vanhu nguva "
           "dzose vamwe matatu usiku chiedza ibwe nzira muti ruva "
           "zambuko nyeredzi denga gungwa asi kana".split(),
    "afr": "die van vir nie en huis tuin rivier berg brood water "
           "oggend aand vriend straat mark mense nooit altyd ander "
           "drie nag lig klip pad boom blom brug ster baie hemel see "
           "hulle gesê môre".split(),
    "lat": "est non enim autem domus hortus flumen mons panis aqua "
           "mane vesper amicus forum homines numquam semper tres nox "
           "lumen lapis arbor flos pons stella caelum mare tempus "
           "corpus rerum omnium annorum hominibus temporibus montibus "
           "bellum templum populus senatus imperium consulum".split(),
    # Cyrillic family addition:
    "mkd": "што ќе меѓу веќе куќа градина река планина леб вода утро "
           "вечер пријател улица пазар луѓе никогаш секогаш други три "
           "ноќе светлина камен пат дрво цвет мост ѕвезда небо море "
           "куќи ноќта гледаат зборуваат".split(),
    # Arabic-script trigram family:
    "ara": "في من على إلى البيت الحديقة النهر الجبل الخبز الماء "
           "الصباح المساء الصديق الشارع السوق الناس أبدا دائما "
           "الآخرون ثلاثة الليل الضوء الحجر الطريق الشجرة الزهرة "
           "الجسر النجمة السماء البحر هذا التي".split(),
    "pes": "در از که با خانه باغ رودخانه کوه نان آب صبح شب دوست "
           "خیابان بازار مردم هرگز همیشه دیگران سه شبانگاه روشنایی "
           "سنگ راه درخت گل پل ستاره آسمان دریا است برای".split(),
    "urd": "میں سے کے اور گھر باغ دریا پہاڑ روٹی پانی صبح شام دوست "
           "گلی بازار لوگ کبھی ہمیشہ دوسرے تین رات روشنی پتھر راستہ "
           "درخت پھول پل ستارہ آسمان سمندر ہے یہ".split(),
    # Devanagari trigram family:
    "hin": "में के और है घर बगीचा नदी पहाड़ रोटी पानी सुबह शाम दोस्त "
           "गली बाज़ार लोग कभी हमेशा दूसरे तीन रात रोशनी पत्थर रास्ता "
           "पेड़ फूल पुल तारा आकाश समुद्र यह जो".split(),
    "mar": "आणि आहे मध्ये वेळ घर बाग नदी डोंगर भाकरी पाणी सकाळ "
           "संध्याकाळ मित्र रस्ता बाजार लोक कधीही नेहमी इतर तीन "
           "रात्र प्रकाश दगड वाट झाडे फुले पूल तारे आकाश समुद्र "
           "मुळे खूप छोटा मोठा".split(),
    "nep": "छ र हरू हुन्छ घरहरू बगैंचा नदी पहाड रोटी पानी बिहान "
           "साँझ साथीहरू गल्ली बजार मानिसहरू कहिल्यै सधैं अरूहरू तीन "
           "रात उज्यालो ढुङ्गा बाटो रूखहरू फूलहरू पुल ताराहरू आकाश "
           "समुद्र गर्छन् भएको ठूलो सानो".split(),
    # Hebrew-script trigram family:
    "heb": "של את על אשר הבית הגן הנהר ההר הלחם המים הבוקר הערב "
           "החבר הרחוב השוק האנשים לעולם תמיד אחרים שלושה הלילה האור "
           "האבן הדרך העץ הפרח הגשר הכוכב השמים הים ילדים עכשיו".split(),
    "yid": "און די פון איז הויז גארטן טייך בארג ברויט וואסער "
           "פרימארגן אוונט פריינד גאס מארק מענטשן קיינמאל שטענדיק "
           "אנדערע דריי נאכט ליכט שטיין וועג בוים בלום בריק שטערן "
           "הימל דאס וואס".split(),
    # single-script languages (direct map — pool only needs the script):
    "ell": "και σπίτι κήπος ποτάμι βουνό ψωμί νερό πρωί βράδυ φίλος "
           "δρόμος αγορά άνθρωποι νύχτα φως πέτρα μονοπάτι δέντρο "
           "λουλούδι αστέρι".split(),
    "tha": "และ บ้าน สวน แม่น้ำ ภูเขา ขนมปัง น้ำ เช้า เย็น เพื่อน ถนน "
           "ตลาด ผู้คน กลางคืน แสง หิน ทาง ต้นไม้ ดอกไม้ ดาว".split(),
    "kor": "그리고 집 정원 강 산 빵 물 아침 저녁 친구 거리 시장 "
           "사람들 밤 빛 돌 길 나무 꽃 별".split(),
    "hye": "եւ տուն այգի գետ լեռ հաց ջուր առավոտ երեկո ընկեր փողոց "
           "շուկա մարդիկ գիշեր լույս քար ճանապարհ ծառ ծաղիկ աստղ".split(),
    "ben": "এবং বাড়ি বাগান নদী পাহাড় রুটি জল সকাল সন্ধ্যা বন্ধু "
           "রাস্তা বাজার মানুষ রাত আলো পাথর পথ গাছ ফুল তারা".split(),
    "pan": "ਅਤੇ ਘਰ ਬਾਗ ਨਦੀ ਪਹਾੜ ਰੋਟੀ ਪਾਣੀ ਸਵੇਰ ਸ਼ਾਮ ਦੋਸਤ ਗਲੀ ਬਾਜ਼ਾਰ "
           "ਲੋਕ ਰਾਤ ਰੋਸ਼ਨੀ ਪੱਥਰ ਰਾਹ ਰੁੱਖ ਫੁੱਲ ਤਾਰਾ".split(),
    "guj": "અને ઘર બગીચો નદી પહાડ રોટલી પાણી સવાર સાંજ મિત્ર શેરી "
           "બજાર લોકો રાત પ્રકાશ પથ્થર રસ્તો ઝાડ ફૂલ તારો".split(),
    "ori": "ଏବଂ ଘର ବଗିଚା ନଦୀ ପାହାଡ ରୁଟି ପାଣି ସକାଳ ସନ୍ଧ୍ୟା ବନ୍ଧୁ ଗଳି "
           "ବଜାର ଲୋକ ରାତି ଆଲୋକ ପଥର ରାସ୍ତା ଗଛ ଫୁଲ ତାରା".split(),
    "tam": "மற்றும் வீடு தோட்டம் ஆறு மலை ரொட்டி தண்ணீர் காலை மாலை "
           "நண்பர் தெரு சந்தை மக்கள் இரவு ஒளி கல் பாதை மரம் பூ "
           "நட்சத்திரம்".split(),
    "tel": "మరియు ఇల్లు తోట నది కొండ రొట్టె నీరు ఉదయం సాయంత్రం "
           "స్నేహితుడు వీధి బజారు ప్రజలు రాత్రి వెలుగు రాయి దారి "
           "చెట్టు పువ్వు నక్షత్రం".split(),
    "kan": "ಮತ್ತು ಮನೆ ತೋಟ ನದಿ ಬೆಟ್ಟ ರೊಟ್ಟಿ ನೀರು ಬೆಳಿಗ್ಗೆ ಸಂಜೆ "
           "ಸ್ನೇಹಿತ ಬೀದಿ ಮಾರುಕಟ್ಟೆ ಜನರು ರಾತ್ರಿ ಬೆಳಕು ಕಲ್ಲು ದಾರಿ "
           "ಮರ ಹೂವು ನಕ್ಷತ್ರ".split(),
    "mal": "ഒപ്പം വീട് തോട്ടം നദി മല റൊട്ടി വെള്ളം രാവിലെ "
           "വൈകുന്നേരം സുഹൃത്ത് തെരുവ് ചന്ത ആളുകൾ രാത്രി വെളിച്ചം "
           "കല്ല് വഴി മരം പൂവ് നക്ഷത്രം".split(),
    "sin": "සහ ගෙදර වත්ත ගඟ කන්ද පාන් වතුර උදේ හවස යාළුවා පාර "
           "වෙළඳපොළ මිනිස්සු රෑ එළිය ගල මග ගස මල තරුව".split(),
    "mya": "နှင့် အိမ် ဥယျာဉ် မြစ် တောင် ပေါင်မုန့် ရေ မနက် ညနေ "
           "မိတ်ဆွေ လမ်း ဈေး လူများ ည အလင်း ကျောက် ခရီး သစ်ပင် "
           "ပန်း ကြယ်".split(),
    "kat": "და სახლი ბაღი მდინარე მთა პური წყალი დილა საღამო "
           "მეგობარი ქუჩა ბაზარი ხალხი ღამე სინათლე ქვა გზა ხე "
           "ყვავილი ვარსკვლავი".split(),
    "amh": "እና ቤት አትክልት ወንዝ ተራራ ዳቦ ውሃ ጠዋት ምሽት ጓደኛ መንገድ ገበያ "
           "ሰዎች ሌሊት ብርሃን ድንጋይ ዛፍ አበባ ኮከብ ከተማ".split(),
    "khm": "និង ផ្ទះ សួន ទន្លេ ភ្នំ នំប៉័ង ទឹក ព្រឹក ល្ងាច មិត្ត "
           "ផ្លូវ ផ្សារ មនុស្ស យប់ ពន្លឺ ថ្ម ដើមឈើ ផ្កា ផ្កាយ "
           "ទីក្រុង".split(),
}

# world-language page axis (every 5th page of each host; always a
# Unicode-capable encoding) — the whatlang-parity breadth corpus
_WORLD_LANGS = (
    "epo", "aze", "uzb", "tgl", "tuk", "jav", "aka", "zul", "sna", "afr",
    "lat", "mkd", "ara", "pes", "urd", "hin", "mar", "nep", "heb", "yid",
    "ell", "tha", "kor", "hye", "ben", "pan", "guj", "ori", "tam", "tel",
    "kan", "mal", "sin", "mya", "kat", "amh", "khm",
)
_JP_WORDS = ["検索", "データ", "ページ", "クローラ"]


def _pool_for(lang: str) -> list[str]:
    return _CONTENT[lang]

_ENCODINGS = (
    # (name, weight) — FIXTURES.md §1 distribution. The -nometa encodings
    # carry NO <meta charset> and no BOM: only the chardetng-analog
    # statistical detector (decoding.statistical_guess) can decode them.
    ("utf-8", 58),
    ("utf-16-le", 10),
    ("cp1252", 10),
    ("shift_jis", 5),
    ("utf-8-invalid", 5),
    ("cp1251", 4),
    ("euc_jp", 2),
    ("gb18030", 2),
    ("cp1250", 2),
    ("koi8_u", 2),
)
_ENC_WHEEL = [name for name, w in _ENCODINGS for _ in range(w)]

# encoding -> forced page language (native script drives both the
# statistical encoding detection and the script-based language id)
_ENC_LANG = {
    "cp1251": "rus",
    "euc_jp": "jpn",
    "gb18030": "cmn",
    "cp1250": "ces",
    "koi8_u": "ukr",
}

_INVALID_SENTINEL = "QatraINVALIDq"


def _page_seed(h: int, k: int) -> int:
    return GLOBAL_SEED * 1_000_000_007 + h * 1_000_003 + k


def host_name(h: int) -> str:
    return f"host{h}.example"


def _words(rng: random.Random, lang: str, n: int, ascii_only: bool = False) -> list[str]:
    """Word-salad prose with natural FUNCTION-WORD density: every third
    word comes from the pool's leading function words (real text in any
    language is glued by them — a pure uniform draw can produce an
    English paragraph with no 'the/and' at all, which no real page has)."""
    pool = _pool_for(lang)
    if ascii_only:
        pool = [w for w in pool if w.isascii()]
    func = [w for w in _pool_for(lang)[:4] if not ascii_only or w.isascii()] or pool[:2]
    return [
        rng.choice(func) if i % 3 == 2 else rng.choice(pool) for i in range(n)
    ]


def scale_params(sf: float) -> dict:
    """Host/page counts per scale factor (Zipf-ish skew: every 17th host is
    'hot' with 4-8x the pages — exercises hot-host handling)."""
    if sf <= 0.001:
        hosts, base = 12, 12
    elif sf <= 0.01:
        hosts, base = 40, 40
    else:
        hosts, base = 300, 350
    return {"hosts": hosts, "base_pages": base}


def _robots_class(h: int) -> str:
    r = random.Random(GLOBAL_SEED * 31 + h).random()
    if r < 0.80:
        return "allow"
    if r < 0.90:
        return "disallow_blocked"
    if r < 0.95:
        return "crawl_delay"
    return "missing"


def _wall_class(h: int) -> bool:
    """Cookie-wall hosts (J4 fixture surface): a deterministic subset of
    the robots-allow hosts requires the per-origin cookie
    ``wall=<host>`` for its ``/wall/`` pages (cookies.parquet)."""
    return h % 9 == 5 and _robots_class(h) == "allow"


def wall_cookie(host: str) -> str:
    return f"wall={host}"


def _page_path(h: int, k: int) -> str:
    # on disallow hosts every 5th page lives under /blocked/ (robots-denied)
    if _robots_class(h) == "disallow_blocked" and k % 5 == 0 and k > 0:
        return f"/blocked/p{k}"
    # on cookie-wall hosts every 6th page sits behind the wall
    if _wall_class(h) and k % 6 == 2 and k > 0:
        return f"/wall/p{k}"
    return f"/p{k}"


def _page_counts(hosts: int, base: int) -> list[int]:
    counts = []
    for h in range(hosts):
        rng = random.Random(GLOBAL_SEED * 77 + h)
        if h % 17 == 0:
            counts.append(base * rng.randint(4, 8))
        else:
            counts.append(max(3, int(base * (0.5 + rng.random()))))
    return counts


_GDBR_LANGS = ("eng", "deu", "fra", "spa")


def _gen_page(h: int, k: int, hosts: int, counts: list[int], salt: int = 0):
    """-> (url, html_bytes, oracle_text, lang, oracle_links, clean_text)
    where clean_text is the GDBR oracle (text minus the injected consent
    banner; == oracle_text when no banner), and
    oracle_links = list[(target_raw, origin)] of raw hrefs as written into
    the document (canonicalization happens engine-side; the links_oracle
    table stores the CANONICAL target, computed here by construction).

    ``salt`` redraws the whole page when a legacy-encoded body turns out
    to be byte-for-byte valid UTF-8 (an astronomically rare fluke at
    which ANY detector — chardetng included — correctly prefers UTF-8;
    real legacy pages always contain invalid-UTF-8 runs, so the
    generator guarantees that property instead of oracle-ing a decode no
    engine would produce)."""
    rng = random.Random(_page_seed(h, k) + salt * 0x9E3779B9)
    host = host_name(h)
    path = _page_path(h, k)
    url = f"https://{host}{path}"
    world = k % 5 == 4  # whatlang-parity world-language page
    if world:
        # world pages rotate the breadth corpus and always use a
        # Unicode-capable encoding (legacy codepages cannot encode these
        # scripts); the detector must label them from orthography alone
        lang = _WORLD_LANGS[(h * 13 + k // 5) % len(_WORLD_LANGS)]
        enc = "utf-16-le" if (h + k) % 7 == 3 else "utf-8"
    else:
        lang = _LANGS[h % len(_LANGS)]
        enc = rng.choice(_ENC_WHEEL)
        if enc == "shift_jis":
            lang = "eng"  # shift_jis cannot encode most latin-1 letters
        elif enc == "utf-8-invalid" and lang == "ron":
            # ascii_only strips every diacritic word; Romanian's ASCII
            # subset is generic Romance (undetectable BY DESIGN) — use
            # eng like the shift_jis pages
            lang = "eng"
        elif enc == "cp1252" and lang in ("pol", "tur", "hun", "ron"):
            # cp1252 cannot encode ą/ę/ł, ğ/ş/ı, ő/ű, ă/ș/ț — remap to a
            # cp1252-safe language, a different one per source to keep
            # the encoding×language diversity
            lang = {"pol": "swe", "tur": "ita", "hun": "fra", "ron": "spa"}[lang]
        lang = _ENC_LANG.get(enc, lang)

    ascii_only = enc in ("shift_jis", "utf-8-invalid")
    title = " ".join(_words(rng, lang, rng.randint(2, 4), ascii_only))
    # world pages keep a higher per-paragraph word floor: the measured
    # zero-miss band for the breadth families starts at ~40 pool words
    # per page (tools stress test), and 3 x 14 + title + anchors clears
    # it with margin
    min_para = 14 if world else 10
    paras = [
        " ".join(_words(rng, lang, rng.randint(min_para, 24), ascii_only))
        for _ in range(rng.randint(3, 7))
    ]
    if enc == "shift_jis":
        paras.append(" ".join(rng.choice(_JP_WORDS) for _ in range(4)))
    if enc == "cp1252" and lang == "deu":
        paras.append("über müde straße für größe schön " + " ".join(_words(rng, lang, 6)))
    if enc == "utf-8-invalid":
        # sentinel replaced by a raw invalid byte post-encode; decoder must
        # yield exactly one U+FFFD there
        paras.append("prefix " + _INVALID_SENTINEL + " suffix")

    # GDBR banner injection (~22% of pages in the model's languages): a
    # <div class="cookie-banner"> of 2-4 consent sentences drawn from the
    # shared template pool (functions/gdbr_model.BANNER_TEMPLATES); the
    # clean-text oracle excludes exactly these parts
    banner_sents = None
    if lang in _GDBR_LANGS and rng.random() < 0.22:
        from ..functions.gdbr_model import BANNER_TEMPLATES

        tpl = BANNER_TEMPLATES[lang]
        banner_sents = [rng.choice(tpl) for _ in range(rng.randint(2, 4))]

    # k=0 pages are seed targets — a nofollow seed would amputate a whole
    # host from every crawl test, so nofollow coverage comes from k>0 pages
    meta_nofollow = rng.random() < 0.02 and k > 0
    base_href = None
    if rng.random() < 0.05:
        base_href = f"https://{host}/sub/"

    # ---- choose link targets (by construction we know the canonical urls)
    links: list[tuple[str, str, str]] = []  # (raw_as_written, canonical, origin)

    def add_same_host(j: int, relative: bool):
        tpath = _page_path(h, j)
        if relative:
            # dir-relative href: resolves against <base href> when present,
            # else against the page's own directory (computed by hand here —
            # the oracle must not share the engine's URL code)
            raw = tpath.lstrip("/")  # e.g. "p7" or "blocked/p5"
            if base_href:
                resolve_dir = "/sub/"
            else:
                resolve_dir = path.rsplit("/", 1)[0] + "/"
            canon = f"https://{host}{resolve_dir}{raw}"
            links.append((raw, canon, "href"))
        else:
            canon = f"https://{host}{tpath}"
            links.append((canon, canon, "href"))

    n_same = rng.randint(2, 5)
    for _ in range(n_same):
        j = rng.randrange(counts[h])
        add_same_host(j, rng.random() < 0.5)

    n_cross = rng.randint(0, 2)
    for _ in range(n_cross):
        h2 = rng.randrange(hosts)
        if h2 == h:
            h2 = (h2 + 1) % hosts
        if rng.random() < 0.2:
            canon = f"https://{host_name(h2)}/missing{rng.randrange(999)}"
        else:
            j = rng.randrange(counts[h2])
            canon = f"https://{host_name(h2)}{_page_path(h2, j)}"
        links.append((canon, canon, "href"))

    nofollow_anchor = None
    if rng.random() < 0.05:
        j = rng.randrange(counts[h])
        nofollow_anchor = f"https://{host}{_page_path(h, j)}"

    # redirect-source link: /r{j} 302s to /p{j} (redirects.parquet row
    # written by generate()); exercises the final_redirect_destination path
    if h % 8 == 3 and k % 7 == 0 and _robots_class(h) != "disallow_blocked":
        j = rng.randrange(counts[h])
        r_url = f"https://{host}/r{j}"
        links.append((r_url, r_url, "href"))

    link_css = None
    if rng.random() < 0.10:
        link_css = f"https://{host}/style{rng.randrange(5)}.css"
        links.append((link_css, link_css, "href"))

    script_src = None
    if rng.random() < 0.15:
        script_src = f"https://{host}/js/app{rng.randrange(5)}.js"
        links.append((script_src, script_src, "javascript"))

    js_href = None
    if rng.random() < 0.15:
        h2 = rng.randrange(hosts)
        js_href = f"https://{host_name(h2)}{_page_path(h2, 0)}"
        links.append((js_href, js_href, "javascript_embedded"))

    form_action = None
    if rng.random() < 0.10:
        form_action = f"https://{host}/submit{rng.randrange(3)}"
        links.append((form_action, form_action, "form"))

    onclick_target = None
    if rng.random() < 0.10:
        onclick_target = f"https://{host}{_page_path(h, rng.randrange(counts[h]))}"
        links.append((onclick_target, onclick_target, "onclick"))

    img_src = f"https://{host}/img{rng.randrange(9)}.png" if rng.random() < 0.3 else None
    data_url = "data:text/plain;base64,SGVsbG8=" if rng.random() < 0.02 else None
    if data_url:
        links.append((data_url, data_url, "href"))

    # ---- render HTML (text nodes appear in exactly this order)
    text_parts = [title]
    banner_parts = []
    body_bits = []
    body_bits.append(f"<h1>{title}</h1>")  # title appears once in <title>, once in <h1>
    text_parts.append(title)
    if banner_sents:
        body_bits.append(
            '<div class="cookie-banner">'
            + "".join(f"<p>{s}</p>" for s in banner_sents)
            + "</div>"
        )
        text_parts.extend(banner_sents)
        banner_parts = list(banner_sents)
    for p in paras:
        body_bits.append(f"<p>{p}</p>")
        text_parts.append(p)
    # anchors stay in the PAGE's language (ascii subset on ascii_only
    # pages) — English anchors on a short non-English page tipped the
    # language id toward eng
    anchor_words_pool = (
        _CONTENT[lang]
        if not ascii_only
        else ([w for w in _CONTENT[lang] if w.isascii()] or ["link", "here", "more"])
    )
    for raw, _canon, origin in links:
        if origin == "href" and not raw.startswith("data:"):
            atext = rng.choice(anchor_words_pool)
            body_bits.append(f'<a href="{raw}">{atext}</a>')
            text_parts.append(atext)
    if data_url:
        body_bits.append(f'<a href="{data_url}">blob</a>')
        text_parts.append("blob")
    if nofollow_anchor:
        body_bits.append(f'<a rel="nofollow" href="{nofollow_anchor}">nf</a>')
        text_parts.append("nf")
    if img_src:
        body_bits.append(f'<img src="{img_src}">')
    if script_src:
        body_bits.append(f'<script src="{script_src}"></script>')
    if js_href:
        body_bits.append(
            "<script>var e = document.createElement('a'); "
            f"e.href = '{js_href}'; use(e);</script>"
        )
    if form_action:
        body_bits.append(f'<form action="{form_action}"><input type="submit"></form>')
    if onclick_target:
        body_bits.append(
            f"<div onclick=\"location.href='{onclick_target}';\">click</div>"
        )
        text_parts.append("click")

    head_bits = []
    if enc == "cp1252":
        head_bits.append('<meta charset="iso-8859-1">')
    elif enc == "shift_jis":
        head_bits.append('<meta charset="shift_jis">')
    elif enc == "utf-8" and rng.random() < 0.5:
        head_bits.append('<meta charset="utf-8">')
    if meta_nofollow:
        head_bits.append('<meta name="robots" content="nofollow">')
    if base_href:
        head_bits.append(f'<base href="{base_href}">')
    head_bits.append(f"<title>{title}</title>")

    html = (
        "<!DOCTYPE html><html><head>"
        + "".join(head_bits)
        + "</head>\n<body>\n"
        + "\n".join(body_bits)
        + "\n</body></html>"
    )

    # ---- encode
    if enc == "utf-16-le":
        body = codecs.BOM_UTF16_LE + html.encode("utf-16-le")
    elif enc in ("cp1252", "cp1251", "euc_jp", "gb18030", "cp1250", "koi8_u"):
        body = html.encode(enc)  # strict: generator bug if not encodable
        if enc != "cp1252":  # cp1252 pages carry <meta>; the others are
            try:  # meta-less and must not be valid UTF-8 (see docstring)
                body.decode("utf-8")
            except UnicodeDecodeError:
                pass
            else:
                return _gen_page(h, k, hosts, counts, salt + 1)
    elif enc == "shift_jis":
        body = html.encode("shift_jis")
    elif enc == "utf-8-invalid":
        body = html.encode("utf-8").replace(
            _INVALID_SENTINEL.encode(), b"Q\xffq"
        )
    else:
        body = html.encode("utf-8")

    oracle_text = "\n".join(text_parts)
    clean_parts = [t for t in text_parts if t not in banner_parts]
    clean_text = "\n".join(clean_parts)
    if enc == "utf-8-invalid":
        oracle_text = oracle_text.replace(_INVALID_SENTINEL, "Q�q")
        clean_text = clean_text.replace(_INVALID_SENTINEL, "Q�q")

    # ---- oracle link rows under the DEFAULT extraction config:
    # nofollow page -> no links; nofollow anchor excluded; img (embedded)
    # excluded; kind: on_seed for same-host (relative to the effective base,
    # which is always same-host here), outgoing cross-host, data for data:
    if meta_nofollow:
        oracle_links = []
    else:
        oracle_links = []
        seen = set()
        # links equal to the effective base are dropped by the engine
        # (extractor_method.rs:314); the effective base is the <base href>
        # when present, else the page url itself
        self_url = base_href if base_href else url
        for _raw, canon, origin in links:
            if (canon, origin) in seen or canon == self_url:
                continue
            seen.add((canon, origin))
            if canon.startswith("data:"):
                kind = "data"
            elif canon.split("/")[2] == host:
                kind = "on_seed"
            else:
                kind = "outgoing"
            oracle_links.append((canon, origin, kind))

    return url, body, oracle_text, lang, oracle_links, clean_text


def _gen_plaintext_page(h: int, k: int, hosts: int, counts: list[int]):
    """M12 path: a plain-text page with bare URLs in the prose. Every 3rd
    page carries a deterministic PII span (email, phone, dotted-quad IP)
    so the pii_scrub operator has real signal; the tokens are scheme-less
    (never linkified) and short relative to the prose (never flip the
    trigram language id)."""
    rng = random.Random(_page_seed(h, k) ^ 0x5EED)
    host = host_name(h)
    url = f"https://{host}/notes{k}.txt"
    h2 = (h + 1 + rng.randrange(hosts - 1)) % hosts
    target = f"https://{host_name(h2)}{_page_path(h2, 0)}"
    lang = _LANGS[h % len(_LANGS)]
    pii = ""
    if k % 3 == 0:
        pii = (
            f"contact u{h}k{k}@mail{h % 97}.example"
            f" tel +1 555 {1000 + (h * 31 + k) % 9000}"
            f" node 10.{h % 200}.{k % 200}.{(h * 7 + k) % 250} "
        )
    body_text = (
        " ".join(_words(rng, lang, 18))
        + f" see {target} for more "
        + pii
        + " ".join(_words(rng, lang, 14))
    )
    return url, body_text.encode("utf-8"), body_text, lang, [(target, "plain_text", "outgoing")]


_ZIP_EPOCH = (1980, 1, 1, 0, 0, 0)  # fixed member timestamps: byte-deterministic zips


def _zip_bytes(members: list[tuple[str, bytes]], first_stored: bool = False) -> bytes:
    import io
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        for i, (name, data) in enumerate(members):
            zi = zipfile.ZipInfo(name, date_time=_ZIP_EPOCH)
            zi.compress_type = (
                zipfile.ZIP_STORED if (first_stored and i == 0) else zipfile.ZIP_DEFLATED
            )
            z.writestr(zi, data)
    return buf.getvalue()


def _doc_targets(h: int, kind: str, hosts: int, counts: list[int]) -> list[str]:
    rng = random.Random(_page_seed(h, 9000 + len(kind)))
    out = []
    for _ in range(rng.randint(2, 3)):
        h2 = (h + 1 + rng.randrange(hosts - 1)) % hosts
        out.append(f"https://{host_name(h2)}{_page_path(h2, rng.randrange(counts[h2]))}")
    out.append(f"https://{host_name(h)}/p0")  # one same-host (on_seed) link
    # dedup preserving order (kernels emit unique targets)
    seen = set()
    return [t for t in out if not (t in seen or seen.add(t))]


def _gen_docx_page(h: int, hosts: int, counts: list[int]):
    """M14 OOXML: hyperlinks live in word/_rels/document.xml.rels."""
    url = f"https://{host_name(h)}/doc.docx"
    targets = _doc_targets(h, "docx", hosts, counts)
    rels = (
        '<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        + "".join(
            f'<Relationship Id="rId{i}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/hyperlink" Target="{t}" TargetMode="External"/>'
            for i, t in enumerate(targets)
        )
        + "</Relationships>"
    )
    body = _zip_bytes(
        [
            ("[Content_Types].xml", b'<?xml version="1.0"?><Types/>'),
            ("word/document.xml", b'<?xml version="1.0"?><w:document xmlns:w="urn:x"><w:body><w:p/></w:body></w:document>'),
            ("word/_rels/document.xml.rels", rels.encode()),
        ]
    )
    return url, body, None, "und", [(t, "ooxml", _doc_kind(t, h)) for t in sorted(targets)]


def _gen_odt_page(h: int, hosts: int, counts: list[int]):
    """M14 ODF: <text:a xlink:href> anchors in content.xml."""
    url = f"https://{host_name(h)}/doc.odt"
    targets = _doc_targets(h, "odt", hosts, counts)
    content = (
        '<?xml version="1.0"?><office:document-content xmlns:office="urn:o" xmlns:text="urn:t" xmlns:xlink="http://www.w3.org/1999/xlink"><office:body><office:text>'
        + "".join(f'<text:p><text:a xlink:href="{t}">link</text:a></text:p>' for t in targets)
        + "</office:text></office:body></office:document-content>"
    )
    body = _zip_bytes(
        [
            ("mimetype", b"application/vnd.oasis.opendocument.text"),
            ("content.xml", content.encode()),
        ],
        first_stored=True,
    )
    return url, body, None, "und", [(t, "odf", _doc_kind(t, h)) for t in sorted(targets)]


def _gen_pdf_page(h: int, hosts: int, counts: list[int]):
    """M14 PDF: /URI action entries in link annotations."""
    url = f"https://{host_name(h)}/doc.pdf"
    targets = _doc_targets(h, "pdf", hosts, counts)
    annots = "".join(
        f"<< /Type /Annot /Subtype /Link /A << /S /URI /URI ({t}) >> >>\n"
        for t in targets
    )
    body = (
        "%PDF-1.4\n1 0 obj << /Type /Catalog >> endobj\n" + annots + "%%EOF\n"
    ).encode()
    return url, body, None, "und", [(t, "pdf", _doc_kind(t, h)) for t in sorted(targets)]


def _gen_rtf_page(h: int, hosts: int, counts: list[int]):
    """M14 RTF: HYPERLINK field instructions."""
    url = f"https://{host_name(h)}/doc.rtf"
    targets = _doc_targets(h, "rtf", hosts, counts)
    fields = "".join(
        '{\\field{\\*\\fldinst HYPERLINK "' + t + '"}{\\fldrslt link}}'
        for t in targets
    )
    body = ("{\\rtf1\\ansi some text " + fields + "}").encode()
    return url, body, None, "und", [(t, "rtf", _doc_kind(t, h)) for t in sorted(targets)]


def _gen_jpeg_page(h: int, hosts: int, counts: list[int]):
    """M14 EXIF: a JPEG whose APP1 Exif segment carries urls in ASCII
    fields (ImageDescription + Artist) — exercises the real IFD walk."""
    import struct

    url = f"https://{host_name(h)}/photo.jpg"
    targets = _doc_targets(h, "jpeg", hosts, counts)
    fields = []  # (tag, text)
    fields.append((0x010E, f"see {targets[0]} for the original"))
    for i, t in enumerate(targets[1:]):
        fields.append((0x013B + i, t))  # Artist, then vendor-ish tags
    # little-endian TIFF: IFD0 with len(fields) ASCII entries, data after
    n = len(fields)
    ifd_size = 2 + n * 12 + 4
    data_off = 8 + ifd_size
    entries = b""
    blob = b""
    for tag, text in fields:
        raw = text.encode() + b"\x00"
        entries += struct.pack("<HHI", tag, 2, len(raw)) + struct.pack(
            "<I", data_off + len(blob)
        )
        blob += raw
    tiff = (
        b"II*\x00"
        + struct.pack("<I", 8)
        + struct.pack("<H", n)
        + entries
        + struct.pack("<I", 0)
        + blob
    )
    app1 = b"Exif\x00\x00" + tiff
    body = (
        b"\xff\xd8"
        + b"\xff\xe1"
        + struct.pack(">H", len(app1) + 2)
        + app1
        + b"\xff\xd9"
    )
    return url, body, None, "und", [
        (t, "image", _doc_kind(t, h)) for t in sorted(targets)
    ]


def _doc_kind(target: str, h: int) -> str:
    return "on_seed" if target.split("/")[2] == host_name(h) else "outgoing"


def generate(out_dir: str | os.PathLike, sf: float, force: bool = False) -> Path:
    """Idempotent: returns immediately when ``<out_dir>/_SUCCESS`` exists."""
    out = Path(out_dir)
    marker = out / "_SUCCESS"
    if (
        marker.exists()
        and not force
        and marker.read_text().strip() == GENERATOR_VERSION
    ):
        return out
    out.mkdir(parents=True, exist_ok=True)

    p = scale_params(sf)
    hosts, base = p["hosts"], p["base_pages"]
    counts = _page_counts(hosts, base)

    urls, tss, htmls, texts, langs = [], [], [], [], []
    clean_texts = []  # GDBR oracle (== text when no banner injected)
    link_rows = {"url": [], "target": [], "origin": [], "kind": []}
    row_idx = 0

    def emit(url, body, text, lang, olinks, clean_text=None):
        nonlocal row_idx
        urls.append(url)
        tss.append(EPOCH_US + row_idx * 1_000_000)
        htmls.append(body)
        texts.append(text)
        langs.append(lang)
        clean_texts.append(text if clean_text is None else clean_text)
        for target, origin, kind in olinks:
            link_rows["url"].append(url)
            link_rows["target"].append(target)
            link_rows["origin"].append(origin)
            link_rows["kind"].append(kind)
        row_idx += 1

    for h in range(hosts):
        for k in range(counts[h]):
            emit(*_gen_page(h, k, hosts, counts))
        # ~4% extra plain-text pages per host
        n_txt = max(1, counts[h] // 25)
        for k in range(n_txt):
            emit(*_gen_plaintext_page(h, k, hosts, counts))
        # M14 binary-document pages (one of each format on every 5th host)
        if h % 5 == 2:
            emit(*_gen_docx_page(h, hosts, counts))
            emit(*_gen_odt_page(h, hosts, counts))
            emit(*_gen_pdf_page(h, hosts, counts))
            emit(*_gen_rtf_page(h, hosts, counts))
            emit(*_gen_jpeg_page(h, hosts, counts))

    pages = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )
    # pages.parquet is a DIRECTORY of shard files: Ray Data parallelizes
    # reads at file granularity (a single file = ONE serial read task +
    # SplitBlocks, which caps scaling), and the 100-TB input this models is
    # always many files. pyarrow/duckdb read the directory transparently.
    pages_dir = out / "pages.parquet"
    import shutil as _shutil

    if pages_dir.is_file():
        pages_dir.unlink()
    _shutil.rmtree(pages_dir, ignore_errors=True)
    pages_dir.mkdir(parents=True)
    # ~1200 rows per shard, rows INTERLEAVED across shards: contiguous
    # slices cluster hot hosts (Zipf skew) into heavy shards and the
    # straggler tail eats the scaling efficiency; interleaving gives
    # uniform task weights, which is what a real CC dump's randomized
    # shard layout looks like too
    n_shards = max(4, min(256, pages.num_rows // 1200 + 1))
    import numpy as _np

    for i in range(n_shards):
        idx = _np.arange(i, pages.num_rows, n_shards)
        if len(idx):
            pq.write_table(
                pages.take(idx), pages_dir / f"part-{i:05d}.parquet",
                row_group_size=4096,
            )
    pq.write_table(pa.table({k: pa.array(v, pa.string()) for k, v in link_rows.items()}), out / "links_oracle.parquet")
    # GDBR clean-text oracle (M18): text minus the injected banner parts
    pq.write_table(
        pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "clean_text": pa.array(clean_texts, pa.string()),
            }
        ),
        out / "gdbr_oracle.parquet",
    )

    # seeds: every 3rd host, path /p0 (always exists: k=0 never /blocked/),
    # plus one host with no pages at all (fetch-miss seed)
    seed_urls = [f"https://{host_name(h)}/p0" for h in range(hosts) if h % 3 == 0]
    seed_urls.append(f"https://host{hosts}.example/p0")
    pq.write_table(
        pa.table({"url": pa.array(seed_urls, pa.string()),
                  "is_seed": pa.array([True] * len(seed_urls))}),
        out / "seeds.parquet",
    )
    (out / "seeds.txt").write_text("\n".join(seed_urls) + "\n")

    rh, rb = [], []
    for h in range(hosts):
        cls = _robots_class(h)
        if cls == "missing":
            continue
        rh.append(host_name(h))
        if cls == "allow":
            body = b"User-agent: *\nAllow: /\n"
        elif cls == "disallow_blocked":
            body = b"User-agent: *\nDisallow: /blocked/\n"
        else:
            body = b"User-agent: *\nCrawl-delay: 2\n"
        if h % 12 == 0:
            # index-tree hosts: the root sitemap is discoverable ONLY via
            # the robots ``Sitemap:`` declaration (RFC 9309 file-wide
            # directive) — exercises the robots->sitemap discovery path
            body += f"Sitemap: https://{host_name(h)}/sitemap.xml\n".encode()
        rb.append(body)
    pq.write_table(
        pa.table({"host": pa.array(rh, pa.string()),
                  "robots_txt": pa.array(rb, pa.binary())}),
        out / "robots.parquet",
    )

    # cookies.parquet (J4 per-origin overrides, config/crawl.rs:161-184):
    # wall hosts serve their /wall/ pages ONLY to requests whose effective
    # Cookie header matches — the observable end of
    # CrawlConfig.cookies_per_origin / headers_per_origin
    wall_hosts = [host_name(h) for h in range(hosts) if _wall_class(h)]
    pq.write_table(
        pa.table(
            {
                "host": pa.array(wall_hosts, pa.string()),
                "cookie": pa.array([wall_cookie(x) for x in wall_hosts], pa.string()),
            }
        ),
        out / "cookies.parquet",
    )

    # sitemaps.parquet: hosts h%6==0 publish sitemaps covering up to 10 of
    # their pages — including ones unreachable via links (the value of
    # sitemap expansion); served as a side table like robots (the sandbox
    # fetches from tables, not HTTP). One row per sitemap DOCUMENT
    # (host, sitemap_url, is_root, sitemap_xml). h%12==0 hosts publish a
    # TWO-LEVEL <sitemapindex> tree (root index -> child index -> leaf
    # urlsets) whose root is declared via robots ``Sitemap:`` when robots
    # exist (is_root only for robots-missing hosts); other h%6==0 hosts
    # keep the flat single-urlset layout keyed by host.
    def _urlset(locs):
        return (
            '<?xml version="1.0" encoding="UTF-8"?>\n'
            '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
            + "\n".join(f"  <url><loc>{u}</loc></url>" for u in locs)
            + "\n</urlset>\n"
        ).encode()

    def _smindex(children):
        return (
            '<?xml version="1.0" encoding="UTF-8"?>\n'
            '<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
            + "\n".join(f"  <sitemap><loc>{u}</loc></sitemap>" for u in children)
            + "\n</sitemapindex>\n"
        ).encode()

    sm_h, sm_u, sm_r, sm_b = [], [], [], []

    def _sm_row(h, url, is_root, xml):
        sm_h.append(host_name(h))
        sm_u.append(url)
        sm_r.append(is_root)
        sm_b.append(xml)

    for h in range(hosts):
        if h % 6 != 0:
            continue
        base = f"https://{host_name(h)}"
        locs = [
            f"{base}{_page_path(h, k)}" for k in range(min(counts[h], 10))
        ]
        if h % 12 == 0:
            half = max(1, len(locs) // 2)
            leaves = [locs[:half]] + ([locs[half:]] if locs[half:] else [])
            leaf_urls = [f"{base}/sitemap-leaf-{i}.xml" for i in range(len(leaves))]
            # root discoverable via robots Sitemap: (except robots-missing
            # hosts, which fall back to the conventional host-root entry)
            _sm_row(
                h, f"{base}/sitemap.xml", _robots_class(h) == "missing",
                _smindex([f"{base}/sitemap-idx.xml"]),
            )
            _sm_row(h, f"{base}/sitemap-idx.xml", False, _smindex(leaf_urls))
            for lu, ls in zip(leaf_urls, leaves):
                _sm_row(h, lu, False, _urlset(ls))
        else:
            _sm_row(h, f"{base}/sitemap.xml", True, _urlset(locs))
    pq.write_table(
        pa.table({"host": pa.array(sm_h, pa.string()),
                  "sitemap_url": pa.array(sm_u, pa.string()),
                  "is_root": pa.array(sm_r, pa.bool_()),
                  "sitemap_xml": pa.array(sm_b, pa.binary())}),
        out / "sitemaps.parquet",
    )

    # redirects.parquet: every /r{j} url of the h%8==3 hosts 302s to /p{j}
    # (the fetch layer resolves through this map; extraction then uses the
    # FINAL url as base, like the reference's final_redirect_destination)
    r_src, r_dst = [], []
    for h in range(hosts):
        if h % 8 != 3 or _robots_class(h) == "disallow_blocked":
            continue
        for j in range(counts[h]):
            r_src.append(f"https://{host_name(h)}/r{j}")
            r_dst.append(f"https://{host_name(h)}{_page_path(h, j)}")
    pq.write_table(
        pa.table({"url": pa.array(r_src, pa.string()),
                  "final_url": pa.array(r_dst, pa.string())}),
        out / "redirects.parquet",
    )

    (out / "meta.json").write_text(json.dumps({"sf": sf, "seed": GLOBAL_SEED, "rows": row_idx, "hosts": hosts}))
    marker.write_text(GENERATOR_VERSION)
    return out


def fixture_dir_for(sf_dir: str) -> Path:
    """Map a driver sf_dir like /root/testdata/sf0.01 -> the cached fixture
    dir /tmp/atra_fixtures/sf0.01 (generated on demand)."""
    name = Path(sf_dir).name  # e.g. "sf0.01"
    sf = float(name[2:]) if name.startswith("sf") else 0.01
    return generate(Path("/tmp/atra_fixtures") / name, sf)
