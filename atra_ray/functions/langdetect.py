"""Language identification (SURVEY.md M17).

The reference uses whatlang over the document's text nodes
(atra/src/toolkit/language_detection.rs:97-253; ≤1 MB sample). whatlang
works in two stages — SCRIPT detection by Unicode ranges, then a
per-script classifier (character-TRIGRAM profiles for Latin/Cyrillic,
direct mapping for single-language scripts) with a confidence value. We
mirror that shape exactly:

- ``detect_script`` counts characters per Unicode script (vectorized);
- single-language scripts map directly (kana→jpn, hangul→kor, han→cmn,
  greek→ell, thai→tha, plus the 14 round-4 additions: armenian→hye,
  bengali→ben, gurmukhi→pan, gujarati→guj, oriya→ori, tamil→tam,
  telugu→tel, kannada→kan, malayalam→mal, sinhala→sin, myanmar→mya,
  georgian→kat, ethiopic→amh, khmer→khm);
- multi-language scripts run a **trigram classifier** per family —
  Latin (36 languages), Cyrillic (6), Arabic script (ara/pes/urd),
  Devanagari (hin/mar/nep), Hebrew script (heb/yid): per-language
  profiles of space-padded character trigrams (the Cavnar-Trenkle /
  whatlang method), built at import time from the embedded
  ``PROFILE_TEXT`` training prose below, scored by cosine similarity
  between the text's trigram-frequency vector and each profile.

Coverage is whatlang's full 69-language inventory (``ALL_LANGS``).

The training prose is authored for THIS module and is deliberately
disjoint from the fixture generator's vocabulary (sources/fixtures.py
composes pages from its own independent word pools) — detection accuracy
on fixtures is therefore a real measurement, not a circular one
(VERDICT r2 item 4).

``detect_language_info`` returns (lang, script, confidence) like
whatlang's ``Info``; codes are ISO-639-3, or "und" when no evidence.
The sample cap (1 MB of text) matches language_detection.rs:103.
"""

from __future__ import annotations

__all__ = [
    "detect_language",
    "detect_language_info",
    "detect_script",
    "PROFILE_TEXT",
    "LATIN_LANGS",
    "CYRILLIC_LANGS",
    "ARABIC_LANGS",
    "DEVANAGARI_LANGS",
    "HEBREW_LANGS",
    "ALL_LANGS",
]

MAX_SAMPLE_CHARS = 1_000_000
# trigram extraction cap: classification saturates long before this, and
# the per-page budget matters in the extract hot path
_TRIGRAM_SAMPLE_CHARS = 4096

# Training prose per language (ISO-639-3 keys): a few sentences of
# ordinary text, rich in function words — the trigram profile source.
# Latin-script languages first, then Cyrillic.
PROFILE_TEXT: dict[str, str] = {
    "eng": (
        "the quick development of free software has changed how people "
        "work and live together many users read and write documents every "
        "day while others search for information about science history "
        "and culture the weather today is cold but tomorrow it will be "
        "warm and sunny children play in the park after school and "
        "families gather for dinner in the evening this is one of the "
        "most important things that we have seen in recent years "
        "in the city there are many old houses and narrow streets where "
        "musicians play in the open squares people buy fresh bread fruit "
        "and fish at the market and children run between the stalls "
        "laughing it was already late when they returned home"
    ),
    "deu": (
        "die schnelle entwicklung freier software hat verändert wie "
        "menschen arbeiten und zusammen leben viele nutzer lesen und "
        "schreiben jeden tag dokumente während andere nach informationen "
        "über wissenschaft geschichte und kultur suchen das wetter ist "
        "heute kalt aber morgen wird es warm und sonnig die kinder "
        "spielen nach der schule im park und die familien treffen sich "
        "abends zum essen das ist eine der wichtigsten sachen die wir in "
        "den letzten jahren gesehen haben in der stadt gibt es viele "
        "alte häuser und enge gassen wo musiker auf den offenen plätzen "
        "spielen die leute kaufen frisches brot obst und fisch auf dem "
        "markt und die kinder laufen lachend zwischen den ständen es war "
        "schon spät als sie nach hause zurückkehrten"
    ),
    "fra": (
        "le développement rapide des logiciels libres a changé la façon "
        "dont les gens travaillent et vivent ensemble beaucoup "
        "d'utilisateurs lisent et écrivent des documents chaque jour "
        "tandis que d'autres cherchent des informations sur la science "
        "l'histoire et la culture le temps est froid aujourd'hui mais "
        "demain il fera chaud et ensoleillé les enfants jouent dans le "
        "parc après l'école et les familles se réunissent le soir pour "
        "dîner c'est une des choses les plus importantes que nous avons "
        "vues ces dernières années dans la ville il y a beaucoup de "
        "vieilles maisons et de rues étroites où les musiciens jouent "
        "sur les places ouvertes les gens achètent du pain frais des "
        "fruits et du poisson au marché et les enfants courent entre les "
        "étals en riant il était déjà tard quand ils sont rentrés chez "
        "eux"
    ),
    "spa": (
        "el rápido desarrollo del software libre ha cambiado la forma en "
        "que las personas trabajan y viven juntas muchos usuarios leen y "
        "escriben documentos cada día mientras otros buscan información "
        "sobre ciencia historia y cultura el tiempo hoy es frío pero "
        "mañana será cálido y soleado los niños juegan en el parque "
        "después de la escuela y las familias se reúnen por la noche "
        "para cenar esta es una de las cosas más importantes que hemos "
        "visto en los últimos años en la ciudad hay muchas casas viejas "
        "y calles estrechas donde los músicos tocan en las plazas "
        "abiertas la gente compra pan fresco fruta y pescado en el "
        "mercado y los niños corren entre los puestos riendo ya era "
        "tarde cuando volvieron a casa"
    ),
    "ita": (
        "il rapido sviluppo del software libero ha cambiato il modo in "
        "cui le persone lavorano e vivono insieme molti utenti leggono e "
        "scrivono documenti ogni giorno mentre altri cercano informazioni "
        "sulla scienza la storia e la cultura il tempo oggi è freddo ma "
        "domani sarà caldo e soleggiato i bambini giocano nel parco dopo "
        "la scuola e le famiglie si riuniscono la sera per cenare questa "
        "è una delle cose più importanti che abbiamo visto negli ultimi "
        "anni in città ci sono molte case vecchie e strade strette dove "
        "i musicisti suonano nelle piazze aperte la gente compra pane "
        "fresco frutta e pesce al mercato e i bambini corrono tra le "
        "bancarelle ridendo era già tardi quando sono tornati a casa"
    ),
    "por": (
        "o rápido desenvolvimento do software livre mudou a forma como "
        "as pessoas trabalham e vivem juntas muitos usuários leem e "
        "escrevem documentos todos os dias enquanto outros procuram "
        "informações sobre ciência história e cultura o tempo hoje está "
        "frio mas amanhã será quente e ensolarado as crianças brincam no "
        "parque depois da escola e as famílias se reúnem à noite para "
        "jantar esta é uma das coisas mais importantes que vimos nos "
        "últimos anos na cidade há muitas casas velhas e ruas estreitas "
        "onde os músicos tocam nas praças abertas as pessoas compram pão "
        "fresco fruta e peixe no mercado e as crianças correm entre as "
        "bancas a rir já era tarde quando voltaram para casa"
    ),
    "nld": (
        "de snelle ontwikkeling van vrije software heeft veranderd hoe "
        "mensen samen werken en leven veel gebruikers lezen en schrijven "
        "elke dag documenten terwijl anderen zoeken naar informatie over "
        "wetenschap geschiedenis en cultuur het weer is vandaag koud "
        "maar morgen wordt het warm en zonnig de kinderen spelen na "
        "school in het park en de families komen in de avond samen om te "
        "eten dit is een van de belangrijkste dingen die wij de laatste "
        "jaren hebben gezien in de stad zijn veel oude huizen en smalle "
        "straten waar muzikanten op de open pleinen spelen de mensen "
        "kopen vers brood fruit en vis op de markt en de kinderen rennen "
        "lachend tussen de kramen het was al laat toen zij naar huis "
        "terugkeerden"
    ),
    "swe": (
        "den snabba utvecklingen av fri programvara har förändrat hur "
        "människor arbetar och lever tillsammans många användare läser "
        "och skriver dokument varje dag medan andra söker efter "
        "information om vetenskap historia och kultur vädret är kallt "
        "idag men imorgon blir det varmt och soligt barnen leker i "
        "parken efter skolan och familjerna samlas på kvällen för att "
        "äta middag detta är en av de viktigaste sakerna som vi har sett "
        "under de senaste åren i staden finns många gamla hus och trånga "
        "gator där musiker spelar på de öppna torgen folk köper färskt "
        "bröd frukt och fisk på marknaden och barnen springer skrattande "
        "mellan stånden det var redan sent när de kom hem igen det var "
        "en gång en liten pojke som bodde i ett litet hus vid en sjö i "
        "skogen en dag gick han ut för att fiska och han fick en stor "
        "fisk det blev en fin middag för hela familjen"
    ),
    "pol": (
        "szybki rozwój wolnego oprogramowania zmienił sposób w jaki "
        "ludzie pracują i żyją razem wielu użytkowników czyta i pisze "
        "dokumenty każdego dnia podczas gdy inni szukają informacji o "
        "nauce historii i kulturze pogoda jest dzisiaj zimna ale jutro "
        "będzie ciepło i słonecznie dzieci bawią się w parku po szkole a "
        "rodziny spotykają się wieczorem na kolacji to jest jedna z "
        "najważniejszych rzeczy które widzieliśmy w ostatnich latach "
        "w mieście jest wiele starych domów i wąskich ulic gdzie muzycy "
        "grają na otwartych placach ludzie kupują świeży chleb owoce i "
        "ryby na targu a dzieci biegają śmiejąc się między straganami "
        "było już późno kiedy wrócili do domu"
    ),
    "ces": (
        "rychlý rozvoj svobodného softwaru změnil způsob jakým lidé "
        "společně pracují a žijí mnoho uživatelů čte a píše dokumenty "
        "každý den zatímco jiní hledají informace o vědě historii a "
        "kultuře počasí je dnes chladné ale zítra bude teplo a slunečno "
        "děti si hrají v parku po škole a rodiny se večer scházejí na "
        "večeři to je jedna z nejdůležitějších věcí které jsme v "
        "posledních letech viděli ve městě je mnoho starých domů a "
        "úzkých ulic kde hudebníci hrají na otevřených náměstích lidé "
        "kupují čerstvý chléb ovoce a ryby na trhu a děti běhají se "
        "smíchem mezi stánky bylo už pozdě když se vrátili domů děti "
        "mohou běžet přes celé náměstí ještě před večeří a stůl už byl "
        "prostřený může to být těžké ale předtím jsme to vždy zvládli "
        "řeka teče kolem města a na břehu stojí staré stromy světlo se "
        "večer odráží na hladině a lidé se dívají z mostů"
    ),
    "rus": (
        "быстрое развитие свободного программного обеспечения изменило "
        "то как люди работают и живут вместе многие пользователи каждый "
        "день читают и пишут документы а другие ищут информацию о науке "
        "истории и культуре погода сегодня холодная но завтра будет "
        "тепло и солнечно дети играют в парке после школы а семьи "
        "собираются вечером на ужин это одна из самых важных вещей "
        "которые мы видели в последние годы в городе много старых домов "
        "и узких улиц где музыканты играют на открытых площадях люди "
        "покупают свежий хлеб фрукты и рыбу на рынке а дети со смехом "
        "бегают между прилавками было уже поздно когда они вернулись "
        "домой"
    ),
    "ukr": (
        "швидкий розвиток вільного програмного забезпечення змінив те "
        "як люди працюють і живуть разом багато користувачів щодня "
        "читають і пишуть документи а інші шукають інформацію про науку "
        "історію та культуру погода сьогодні холодна але завтра буде "
        "тепло і сонячно діти граються в парку після школи а родини "
        "збираються ввечері на вечерю це одна з найважливіших речей які "
        "ми бачили в останні роки у місті багато старих будинків і "
        "вузьких вулиць де музиканти грають на відкритих площах люди "
        "купують свіжий хліб фрукти і рибу на ринку а діти зі сміхом "
        "бігають між прилавками було вже пізно коли вони повернулися "
        "додому"
    ),
    "ron": (
        "dezvoltarea rapidă a programelor libere a schimbat felul în "
        "care oamenii muncesc și trăiesc împreună mulți utilizatori "
        "citesc și scriu documente în fiecare zi iar alții caută "
        "informații despre știință istorie și cultură vremea de astăzi "
        "este rece dar mâine va fi cald și însorit copiii se joacă în "
        "parc după școală iar familiile se adună seara la cină acesta "
        "este unul dintre cele mai importante lucruri pe care le-am "
        "văzut în ultimii ani în oraș sunt multe case vechi și străzi "
        "înguste unde muzicienii cântă în piețele deschise oamenii "
        "cumpără pâine proaspătă fructe și pește de la piață iar copiii "
        "aleargă râzând printre tarabe era deja târziu când s-au întors "
        "acasă copiii vor să meargă la școală iar părinții trebuie să "
        "lucreze în fiecare zi el a spus că vrea să cumpere un cadou "
        "pentru un prieten bun vântul bate printre copacii din pădure "
        "iar câmpurile se întind până la râu ea începe să cânte un "
        "cântec vechi și toți se opresc să asculte"
    ),
    "fin": (
        "vapaiden ohjelmistojen nopea kehitys on muuttanut sitä miten "
        "ihmiset työskentelevät ja elävät yhdessä monet käyttäjät "
        "lukevat ja kirjoittavat asiakirjoja joka päivä kun taas toiset "
        "etsivät tietoa tieteestä historiasta ja kulttuurista sää on "
        "tänään kylmä mutta huomenna on lämmintä ja aurinkoista lapset "
        "leikkivät puistossa koulun jälkeen ja perheet kokoontuvat "
        "illalla syömään tämä on yksi tärkeimmistä asioista joita "
        "olemme nähneet viime vuosina kaupungissa on paljon vanhoja "
        "taloja ja kapeita katuja joilla muusikot soittavat avoimilla "
        "aukioilla ihmiset ostavat torilta tuoretta leipää hedelmiä ja "
        "kalaa ja lapset juoksevat nauraen kojujen välissä oli jo "
        "myöhä kun he palasivat kotiin"
    ),
    "dan": (
        "den hurtige udvikling af fri software har ændret hvordan folk "
        "arbejder og lever sammen mange brugere læser og skriver "
        "dokumenter hver dag mens andre søger efter oplysninger om "
        "videnskab historie og kultur vejret i dag er koldt men i "
        "morgen bliver det varmt og solrigt børnene leger i parken "
        "efter skole og familierne samles til aftensmad om aftenen "
        "dette er en af de vigtigste ting vi har set i de seneste år i "
        "byen er der mange gamle huse og smalle gader hvor musikere "
        "spiller på de åbne pladser folk køber frisk brød frugt og "
        "fisk på torvet og børnene løber grinende mellem boderne det "
        "var allerede sent da de kom hjem igen"
    ),
    "nob": (
        "den raske utviklingen av fri programvare har endret hvordan "
        "folk arbeider og lever sammen mange brukere leser og skriver "
        "dokumenter hver dag mens andre leter etter opplysninger om "
        "vitenskap historie og kultur været i dag er kaldt men i "
        "morgen blir det varmt og solfylt barna leker i parken etter "
        "skolen og familiene samles til middag om kvelden dette er en "
        "av de viktigste tingene vi har sett de siste årene i byen "
        "finnes det mange gamle hus og trange gater hvor musikere "
        "spiller på de åpne plassene folk kjøper ferskt brød frukt og "
        "fisk på torget og barna løper leende mellom bodene det var "
        "allerede sent da de kom hjem igjen"
    ),
    "hun": (
        "a szabad szoftverek gyors fejlődése megváltoztatta azt ahogyan "
        "az emberek együtt dolgoznak és élnek sok felhasználó minden "
        "nap dokumentumokat olvas és ír míg mások a tudományról a "
        "történelemről és a kultúráról keresnek információkat az idő "
        "ma hideg de holnap meleg és napos lesz a gyerekek iskola után "
        "a parkban játszanak a családok pedig este vacsorára gyűlnek "
        "össze ez az egyik legfontosabb dolog amit az elmúlt években "
        "láttunk a városban sok régi ház és keskeny utca van ahol a "
        "zenészek a nyitott tereken játszanak az emberek friss "
        "kenyeret gyümölcsöt és halat vesznek a piacon a gyerekek "
        "pedig nevetve szaladgálnak a standok között már késő volt "
        "amikor hazaértek"
    ),
    "tur": (
        "özgür yazılımın hızlı gelişimi insanların birlikte çalışma ve "
        "yaşama biçimini değiştirdi birçok kullanıcı her gün belgeler "
        "okuyor ve yazıyor bazıları ise bilim tarih ve kültür hakkında "
        "bilgi arıyor bugün hava soğuk ama yarın sıcak ve güneşli "
        "olacak çocuklar okuldan sonra parkta oynuyor aileler ise "
        "akşam yemeği için bir araya geliyor bu son yıllarda "
        "gördüğümüz en önemli şeylerden biridir şehirde birçok eski ev "
        "ve dar sokak var müzisyenler açık meydanlarda çalıyor "
        "insanlar pazardan taze ekmek meyve ve balık alıyor çocuklar "
        "ise tezgahların arasında gülerek koşuyor eve döndüklerinde "
        "vakit çoktan geç olmuştu"
    ),
    "cat": (
        "el ràpid desenvolupament del programari lliure ha canviat la "
        "manera com la gent treballa i viu junta molts usuaris "
        "llegeixen i escriuen documents cada dia mentre que altres "
        "busquen informació sobre ciència història i cultura el temps "
        "avui és fred però demà farà calor i sol els nens juguen al "
        "parc després de l'escola i les famílies es reuneixen al "
        "vespre per sopar aquesta és una de les coses més importants "
        "que hem vist els darrers anys a la ciutat hi ha moltes cases "
        "velles i carrers estrets on els músics toquen a les places "
        "obertes la gent compra pa fresc fruita i peix al mercat i els "
        "nens corren rient entre les parades ja era tard quan van "
        "tornar a casa"
    ),
    "hrv": (
        "brzi razvoj slobodnog softvera promijenio je način na koji "
        "ljudi zajedno rade i žive mnogi korisnici svaki dan čitaju i "
        "pišu dokumente dok drugi traže informacije o znanosti "
        "povijesti i kulturi vrijeme je danas hladno ali sutra će biti "
        "toplo i sunčano djeca se nakon škole igraju u parku a obitelji "
        "se navečer okupljaju na večeri ovo je jedna od najvažnijih "
        "stvari koje smo vidjeli posljednjih godina u gradu ima mnogo "
        "starih kuća i uskih ulica gdje glazbenici sviraju na otvorenim "
        "trgovima ljudi na tržnici kupuju svježi kruh voće i ribu a "
        "djeca se smijući trče između štandova već je bilo kasno kada "
        "su se vratili kući"
    ),
    "slk": (
        "rýchly rozvoj slobodného softvéru zmenil to ako ľudia spolu "
        "pracujú a žijú mnohí používatelia každý deň čítajú a píšu "
        "dokumenty zatiaľ čo iní hľadajú informácie o vede histórii a "
        "kultúre počasie je dnes studené ale zajtra bude teplo a "
        "slnečno deti sa po škole hrajú v parku a rodiny sa večer "
        "schádzajú na večeru toto je jedna z najdôležitejších vecí "
        "ktoré sme videli v posledných rokoch v meste je veľa starých "
        "domov a úzkych ulíc kde hudobníci hrajú na otvorených "
        "námestiach ľudia kupujú na trhu čerstvý chlieb ovocie a ryby "
        "a deti so smiechom behajú pomedzi stánky bolo už neskoro keď "
        "sa vrátili domov"
    ),
    "slv": (
        "hiter razvoj proste programske opreme je spremenil način kako "
        "ljudje skupaj delajo in živijo veliko uporabnikov vsak dan "
        "bere in piše dokumente medtem ko drugi iščejo informacije o "
        "znanosti zgodovini in kulturi vreme je danes hladno a jutri "
        "bo toplo in sončno otroci se po šoli igrajo v parku družine "
        "pa se zvečer zberejo na večerji to je ena najpomembnejših "
        "stvari ki smo jih videli v zadnjih letih v mestu je veliko "
        "starih hiš in ozkih ulic kjer glasbeniki igrajo na odprtih "
        "trgih ljudje na tržnici kupujejo svež kruh sadje in ribe "
        "otroci pa se smeje tekajo med stojnicami bilo je že pozno ko "
        "so se vrnili domov"
    ),
    "ind": (
        "perkembangan pesat perangkat lunak bebas telah mengubah cara "
        "orang bekerja dan hidup bersama banyak pengguna membaca dan "
        "menulis dokumen setiap hari sementara yang lain mencari "
        "informasi tentang ilmu pengetahuan sejarah dan budaya cuaca "
        "hari ini dingin tetapi besok akan hangat dan cerah anak anak "
        "bermain di taman setelah sekolah dan keluarga berkumpul untuk "
        "makan malam ini adalah salah satu hal terpenting yang kami "
        "lihat dalam beberapa tahun terakhir di kota ada banyak rumah "
        "tua dan jalan sempit tempat para musisi bermain di alun alun "
        "terbuka orang orang membeli roti segar buah dan ikan di pasar "
        "dan anak anak berlari sambil tertawa di antara kios sudah "
        "larut malam ketika mereka pulang ke rumah"
    ),
    "vie": (
        "sự phát triển nhanh chóng của phần mềm tự do đã thay đổi cách "
        "mọi người làm việc và sống cùng nhau nhiều người dùng đọc và "
        "viết tài liệu mỗi ngày trong khi những người khác tìm kiếm "
        "thông tin về khoa học lịch sử và văn hóa thời tiết hôm nay "
        "lạnh nhưng ngày mai sẽ ấm và có nắng trẻ em chơi trong công "
        "viên sau giờ học và các gia đình quây quần bên bữa tối đây là "
        "một trong những điều quan trọng nhất mà chúng ta đã thấy "
        "trong những năm gần đây trong thành phố có nhiều ngôi nhà cũ "
        "và những con phố hẹp nơi các nhạc công chơi nhạc trên quảng "
        "trường mọi người mua bánh mì tươi trái cây và cá ở chợ còn "
        "trẻ em vừa cười vừa chạy giữa các quầy hàng trời đã khuya khi "
        "họ trở về nhà"
    ),
    "est": (
        "vaba tarkvara kiire areng on muutnud seda kuidas inimesed "
        "koos töötavad ja elavad paljud kasutajad loevad ja kirjutavad "
        "iga päev dokumente samas kui teised otsivad teavet teaduse "
        "ajaloo ja kultuuri kohta ilm on täna külm aga homme tuleb "
        "soe ja päikesepaisteline lapsed mängivad pärast kooli pargis "
        "ja pered kogunevad õhtul õhtusöögile see on üks tähtsamaid "
        "asju mida oleme viimastel aastatel näinud linnas on palju "
        "vanu maju ja kitsaid tänavaid kus muusikud mängivad avatud "
        "väljakutel inimesed ostavad turult värsket leiba puuvilju ja "
        "kala ning lapsed jooksevad naerdes lettide vahel oli juba "
        "hilja kui nad koju tagasi jõudsid"
    ),
    "lav": (
        "brīvās programmatūras straujā attīstība ir mainījusi to kā "
        "cilvēki kopā strādā un dzīvo daudzi lietotāji katru dienu "
        "lasa un raksta dokumentus kamēr citi meklē informāciju par "
        "zinātni vēsturi un kultūru laiks šodien ir auksts bet rīt būs "
        "silts un saulains bērni pēc skolas spēlējas parkā un ģimenes "
        "vakarā pulcējas vakariņās tā ir viena no svarīgākajām lietām "
        "ko esam redzējuši pēdējos gados pilsētā ir daudz vecu māju un "
        "šauru ielu kur mūziķi spēlē atklātos laukumos cilvēki tirgū "
        "pērk svaigu maizi augļus un zivis un bērni smejoties skraida "
        "starp letēm bija jau vēls kad viņi atgriezās mājās"
    ),
    "lit": (
        "spartus laisvosios programinės įrangos vystymasis pakeitė tai "
        "kaip žmonės kartu dirba ir gyvena daugelis naudotojų kasdien "
        "skaito ir rašo dokumentus o kiti ieško informacijos apie "
        "mokslą istoriją ir kultūrą oras šiandien šaltas bet rytoj bus "
        "šilta ir saulėta vaikai po pamokų žaidžia parke o šeimos "
        "vakare renkasi vakarienės tai vienas svarbiausių dalykų "
        "kuriuos matėme pastaraisiais metais mieste yra daug senų namų "
        "ir siaurų gatvių kur muzikantai groja atvirose aikštėse "
        "žmonės turguje perka šviežią duoną vaisius ir žuvį o vaikai "
        "juokdamiesi laksto tarp prekystalių buvo jau vėlu kai jie "
        "grįžo namo"
    ),
    "bul": (
        "бързото развитие на свободния софтуер промени начина по който "
        "хората работят и живеят заедно много потребители четат и "
        "пишат документи всеки ден докато други търсят информация за "
        "науката историята и културата времето днес е студено но утре "
        "ще бъде топло и слънчево децата играят в парка след училище а "
        "семействата се събират вечер за вечеря това е едно от най "
        "важните неща които видяхме през последните години в града има "
        "много стари къщи и тесни улици където музикантите свирят на "
        "откритите площади хората купуват пресен хляб плодове и риба "
        "на пазара а децата тичат със смях между сергиите беше вече "
        "късно когато се прибраха у дома"
    ),
    "srp": (
        "брзи развој слободног софтвера променио је начин на који људи "
        "заједно раде и живе многи корисници сваког дана читају и пишу "
        "документе док други траже информације о науци историји и "
        "култури време је данас хладно али сутра ће бити топло и "
        "сунчано деца се после школе играју у парку а породице се "
        "увече окупљају на вечери ово је једна од најважнијих ствари "
        "које смо видели последњих година у граду има много старих "
        "кућа и уских улица где музичари свирају на отвореним трговима "
        "људи на пијаци купују свеж хлеб воће и рибу а деца се смејући "
        "трче између тезги већ је било касно када су се вратили кући"
    ),
    "bel": (
        "хуткае развіццё свабоднага праграмнага забеспячэння змяніла "
        "тое як людзі разам працуюць і жывуць многія карыстальнікі "
        "штодня чытаюць і пішуць дакументы а іншыя шукаюць інфармацыю "
        "пра навуку гісторыю і культуру надвор'е сёння халоднае але "
        "заўтра будзе цёпла і сонечна дзеці гуляюць у парку пасля "
        "школы а сем'і збіраюцца ўвечары на вячэру гэта адна з самых "
        "важных рэчаў якія мы бачылі ў апошнія гады ў горадзе шмат "
        "старых дамоў і вузкіх вуліц дзе музыкі іграюць на адкрытых "
        "плошчах людзі купляюць на рынку свежы хлеб садавіну і рыбу а "
        "дзеці са смехам бегаюць паміж прылаўкамі было ўжо позна калі "
        "яны вярнуліся дадому"
    ),
    # ---- round-4 whatlang-parity additions (language_detection.rs /
    # whatlang's 69-language inventory). Latin script:
    "epo": (
        "la rapida disvolvo de libera programaro ŝanĝis kiel homoj kune "
        "laboras kaj vivas multaj uzantoj legas kaj skribas dokumentojn "
        "ĉiutage dum aliaj serĉas informojn pri scienco historio kaj "
        "kulturo la vetero hodiaŭ estas malvarma sed morgaŭ estos varma "
        "kaj suna la infanoj ludas en la parko post la lernejo kaj la "
        "familioj kunvenas vespere por manĝi tio estas unu el la plej "
        "gravaj aferoj kiujn ni vidis en la lastaj jaroj en la urbo "
        "estas multaj malnovaj domoj kaj mallarĝaj stratoj kie "
        "muzikistoj ludas sur la malfermitaj placoj homoj aĉetas freŝan "
        "panon fruktojn kaj fiŝojn en la bazaro kaj la infanoj kuras "
        "ridante inter la budoj estis jam malfrue kiam ili revenis "
        "hejmen"
    ),
    "aze": (
        "azad proqram təminatının sürətli inkişafı insanların birlikdə "
        "işləmə və yaşama tərzini dəyişdi bir çox istifadəçi hər gün "
        "sənədlər oxuyur və yazır digərləri isə elm tarix və mədəniyyət "
        "haqqında məlumat axtarır bu gün hava soyuqdur amma sabah isti "
        "və günəşli olacaq uşaqlar məktəbdən sonra parkda oynayır "
        "ailələr isə axşam yeməyi üçün bir yerə toplaşır bu son illərdə "
        "gördüyümüz ən vacib şeylərdən biridir şəhərdə çoxlu köhnə ev "
        "və dar küçə var musiqiçilər açıq meydanlarda çalır insanlar "
        "bazardan təzə çörək meyvə və balıq alır uşaqlar isə "
        "piştaxtaların arasında gülərək qaçır evə qayıdanda artıq gec "
        "idi"
    ),
    "uzb": (
        "erkin dasturiy taʼminotning tez rivojlanishi odamlarning birga "
        "ishlash va yashash tarzini oʻzgartirdi koʻp foydalanuvchilar "
        "har kuni hujjatlar oʻqiydi va yozadi boshqalari esa fan tarix "
        "va madaniyat haqida maʼlumot qidiradi bugun havo sovuq lekin "
        "ertaga issiq va quyoshli boʻladi bolalar maktabdan keyin "
        "bogʻda oʻynaydi oilalar esa kechki ovqat uchun yigʻiladi bu "
        "soʻnggi yillarda koʻrgan eng muhim narsalarimizdan biridir "
        "shaharda koʻp eski uylar va tor koʻchalar bor musiqachilar "
        "ochiq maydonlarda chaladi odamlar bozordan yangi non meva va "
        "baliq oladi bolalar esa rastalar orasida kulib yuguradi ular "
        "uyga qaytganida allaqachon kech edi"
    ),
    "tgl": (
        "ang mabilis na pag-unlad ng malayang software ay nagbago kung "
        "paano nagtatrabaho at namumuhay nang magkasama ang mga tao "
        "maraming gumagamit ang nagbabasa at nagsusulat ng mga dokumento "
        "araw-araw habang ang iba ay naghahanap ng impormasyon tungkol "
        "sa agham kasaysayan at kultura malamig ang panahon ngayon "
        "ngunit bukas ay magiging mainit at maaraw naglalaro ang mga "
        "bata sa parke pagkatapos ng klase at nagtitipon ang mga "
        "pamilya para sa hapunan isa ito sa pinakamahalagang bagay na "
        "nakita natin nitong mga nakaraang taon sa lungsod maraming "
        "lumang bahay at makikitid na kalye kung saan tumutugtog ang "
        "mga musikero sa mga bukas na plaza bumibili ang mga tao ng "
        "sariwang tinapay prutas at isda sa palengke at tumatakbo ang "
        "mga bata nang tumatawa sa pagitan ng mga puwesto gabi na nang "
        "umuwi sila"
    ),
    "tuk": (
        "erkin programma üpjünçiliginiň çalt ösüşi adamlaryň bilelikde "
        "işleýşini we ýaşaýşyny üýtgetdi köp ulanyjy her gün "
        "resminamalary okaýar we ýazýar beýlekiler bolsa ylym taryh we "
        "medeniýet barada maglumat gözleýär şu gün howa sowuk emma "
        "ertir yssy we günli bolar çagalar mekdepden soň seýilgähde "
        "oýnaýarlar maşgalalar bolsa agşamlyk nahar üçin ýygnanýarlar "
        "bu soňky ýyllarda gören iň möhüm zatlarymyzyň biridir şäherde "
        "köp köne jaý we dar köçe bar sazandalar açyk meýdançalarda "
        "saz çalýarlar adamlar bazardan täze çörek miwe we balyk "
        "alýarlar çagalar bolsa tekjeleriň arasynda gülüp ylgaýarlar "
        "olar öýe gaýdyp gelende eýýäm giçdi"
    ),
    "jav": (
        "perkembangan cepet saka piranti lunak bebas wis ngowahi carane "
        "wong padha nyambut gawe lan urip bebarengan akeh panganggo "
        "maca lan nulis dokumen saben dina dene liyane nggoleki "
        "informasi babagan ilmu sejarah lan budaya dina iki hawane "
        "adhem nanging sesuk bakal panas lan ana srengenge bocah bocah "
        "dolanan ing taman sawise sekolah lan kulawarga padha kumpul "
        "kanggo mangan bengi iki salah siji perkara sing paling penting "
        "sing wis dideleng ing taun taun pungkasan ing kutha ana akeh "
        "omah lawas lan dalan ciyut panggonan para musisi main ing alun "
        "alun kang mbukak wong padha tuku roti seger woh lan iwak ing "
        "pasar lan bocah bocah mlayu karo ngguyu ing antarane warung "
        "wis bengi nalika dheweke padha mulih"
    ),
    "aka": (
        "ahofadi dwumadie a ɛyɛ kwa no nkɔso ntɛmntɛm asesa sɛnea nnipa "
        "yɛ adwuma na wɔtena ase bom no nnipa pii kenkan na wɔkyerɛw "
        "nkrataa da biara na afoforo nso hwehwɛ nsɛm a ɛfa nyansahu "
        "abakɔsɛm ne amammerɛ ho nnɛ wim ayɛ nwini nanso ɔkyena ɛbɛyɛ "
        "hyew na owia bɛbɔ mmofra di agorɔ wɔ abɔnten so bere a sukuu "
        "asa no na mmusua hyia anwummere didi yei yɛ nneɛma a ɛho hia "
        "paa a yɛahu wɔ mfe a atwam yi mu baako wɔ kurow no mu no adan "
        "dedaw pii ne akwan nketewa wɔ hɔ baabi a nnwomtofo bɔ nnwom "
        "wɔ mmeae a ɛda hɔ no nnipa tɔ paanoo foforɔ nnuaba ne mpataa "
        "wɔ gua so na mmofra tu mmirika serew wɔ apata no ntam bere a "
        "wɔsan kɔɔ fie no na ade asa"
    ),
    "zul": (
        "ukuthuthuka okusheshayo kwesoftware yamahhala kushintshile "
        "indlela abantu abasebenza ngayo futhi baphile ndawonye "
        "abasebenzisi abaningi bafunda futhi babhale imibhalo nsuku "
        "zonke kanti abanye bafuna ulwazi ngesayensi umlando namasiko "
        "izulu libanda namuhla kodwa kusasa lizoshisa futhi libalele "
        "izingane zidlala epaki ngemva kwesikole futhi imindeni "
        "ihlangana ntambama ukuze idle lokhu kungenye yezinto "
        "ezibaluleke kakhulu esizibonile eminyakeni edlule edolobheni "
        "kunezindlu eziningi ezindala nemigwaqo emincane lapho abaculi "
        "bedlala khona ezigcawini ezivulekile abantu bathenga isinkwa "
        "esisha izithelo nezinhlanzi emakethe futhi izingane zigijima "
        "zihleka phakathi kwamatafula kwase kuhlwile lapho bebuyela "
        "ekhaya"
    ),
    "sna": (
        "kukura nokukurumidza kwesoftware yakasununguka kwakashandura "
        "mashandiro uye magariro evanhu pamwe chete vashandisi vazhinji "
        "vanoverenga nekunyora magwaro zuva rimwe nerimwe vamwe "
        "vachitsvaga ruzivo nezvesayenzi nhoroondo netsika nhasi "
        "kunotonhora asi mangwana kuchapisa uye kuchava nezuva vana "
        "vanotamba mupaki mushure mechikoro uye mhuri dzinoungana "
        "manheru kuti vadye ichi ndechimwe chezvinhu zvakakosha "
        "zvatakaona mumakore apfuura muguta mune dzimba zhinji tsaru "
        "nemigwagwa midiki umo vaimbi vanoridza munzvimbo dzakashama "
        "vanhu vanotenga chingwa chitsva michero nehove pamusika uye "
        "vana vanomhanya vachiseka pakati pezvitoro kwakanga kwatosviba "
        "pavakadzokera kumba"
    ),
    "afr": (
        "die vinnige ontwikkeling van vrye sagteware het verander hoe "
        "mense saam werk en leef baie gebruikers lees en skryf elke dag "
        "dokumente terwyl ander na inligting oor wetenskap geskiedenis "
        "en kultuur soek die weer is vandag koud maar môre sal dit warm "
        "en sonnig wees die kinders speel ná skool in die park en die "
        "gesinne kom saans bymekaar om te eet dit is een van die "
        "belangrikste dinge wat ons in die afgelope jare gesien het in "
        "die stad is daar baie ou huise en nou straatjies waar "
        "musikante op die oop pleine speel mense koop vars brood vrugte "
        "en vis by die mark en die kinders hardloop laggend tussen die "
        "stalletjies dit was al laat toe hulle huis toe gegaan het"
    ),
    "lat": (
        "liberi programmatis celer progressus mutavit quomodo homines "
        "una laborant et vivunt multi usores cotidie documenta legunt "
        "et scribunt dum alii de scientia historia et cultura quaerunt "
        "caelum hodie frigidum est sed cras calidum et apricum erit "
        "pueri post scholam in horto ludunt et familiae vesperi ad "
        "cenam conveniunt haec est una ex rebus maximis quas proximis "
        "annis vidimus in urbe multae domus veteres et viae angustae "
        "sunt ubi musici in foris apertis canunt homines panem recentem "
        "fructus et pisces in macello emunt et pueri ridentes inter "
        "tabernas currunt iam sero erat cum domum redierunt populus "
        "romanus multis cum gentibus bellum gessit et magna pars orbis "
        "terrarum imperio eius subiecta erat senatus et consules de re "
        "publica in curia disputabant milites in castris manebant et "
        "agricolae agros colebant pueri litteras in schola discebant et "
        "poetae carmina de natura deorum hominumque scribebant"
    ),
    # Cyrillic script:
    "mkd": (
        "брзиот развој на слободниот софтвер го промени начинот на кој "
        "луѓето работат и живеат заедно многу корисници секој ден "
        "читаат и пишуваат документи а други бараат информации за "
        "науката историјата и културата времето денес е студено но "
        "утре ќе биде топло и сончево децата си играат во паркот по "
        "училиштето а семејствата се собираат навечер на вечера ова е "
        "една од најважните работи што ги видовме во последните години "
        "во градот има многу стари куќи и тесни улици каде музичарите "
        "свират на отворените плоштади луѓето купуваат свеж леб овошје "
        "и риба на пазарот а децата трчаат смеејќи се меѓу тезгите "
        "веќе беше доцна кога се вратија дома"
    ),
    # Arabic script (ara/pes/urd discriminate by trigrams — Persian's
    # پ/چ/گ and را/که/است, Urdu's ٹ/ڈ/ے and ہے/میں/کے):
    "ara": (
        "التطور السريع للبرمجيات الحرة غير الطريقة التي يعمل بها الناس "
        "ويعيشون معا كثير من المستخدمين يقرؤون ويكتبون الوثائق كل يوم "
        "بينما يبحث آخرون عن معلومات حول العلم والتاريخ والثقافة الطقس "
        "اليوم بارد لكن غدا سيكون دافئا ومشمسا يلعب الأطفال في الحديقة "
        "بعد المدرسة وتجتمع العائلات في المساء لتناول العشاء هذه واحدة "
        "من أهم الأشياء التي رأيناها في السنوات الأخيرة في المدينة "
        "بيوت قديمة كثيرة وشوارع ضيقة حيث يعزف الموسيقيون في الساحات "
        "المفتوحة يشتري الناس الخبز الطازج والفواكه والسمك من السوق "
        "ويركض الأطفال ضاحكين بين الأكشاك كان الوقت متأخرا عندما عادوا "
        "إلى البيت"
    ),
    "pes": (
        "توسعه سریع نرم افزار آزاد شیوه کار و زندگی مردم را با هم "
        "تغییر داده است بسیاری از کاربران هر روز اسناد می خوانند و می "
        "نویسند در حالی که دیگران به دنبال اطلاعاتی درباره علم تاریخ و "
        "فرهنگ هستند هوا امروز سرد است اما فردا گرم و آفتابی خواهد بود "
        "بچه ها بعد از مدرسه در پارک بازی می کنند و خانواده ها شب برای "
        "شام دور هم جمع می شوند این یکی از مهم ترین چیزهایی است که در "
        "سال های اخیر دیده ایم در شهر خانه های قدیمی زیاد و کوچه های "
        "تنگ وجود دارد که نوازندگان در میدان های باز می نوازند مردم از "
        "بازار نان تازه میوه و ماهی می خرند و بچه ها خندان میان دکه ها "
        "می دوند وقتی به خانه برگشتند دیگر دیر شده بود"
    ),
    "urd": (
        "آزاد سافٹ ویئر کی تیز ترقی نے بدل دیا ہے کہ لوگ کیسے مل کر "
        "کام کرتے اور رہتے ہیں بہت سے صارفین ہر روز دستاویزات پڑھتے "
        "اور لکھتے ہیں جبکہ دوسرے سائنس تاریخ اور ثقافت کے بارے میں "
        "معلومات تلاش کرتے ہیں آج موسم سرد ہے لیکن کل گرم اور دھوپ "
        "والا ہوگا بچے اسکول کے بعد پارک میں کھیلتے ہیں اور خاندان شام "
        "کو کھانے کے لیے جمع ہوتے ہیں یہ ان اہم ترین چیزوں میں سے ایک "
        "ہے جو ہم نے حالیہ برسوں میں دیکھی ہیں شہر میں بہت سے پرانے "
        "مکان اور تنگ گلیاں ہیں جہاں موسیقار کھلے میدانوں میں بجاتے "
        "ہیں لوگ بازار سے تازہ روٹی پھل اور مچھلی خریدتے ہیں اور بچے "
        "دکانوں کے درمیان ہنستے ہوئے دوڑتے ہیں جب وہ گھر لوٹے تو کافی "
        "دیر ہو چکی تھی"
    ),
    # Devanagari script (hin/mar/nep — Marathi's आहे/आणि/ळ, Nepali's
    # छ/र/हरू agreement morphology):
    "hin": (
        "मुक्त सॉफ्टवेयर के तेज़ विकास ने बदल दिया है कि लोग कैसे साथ मिलकर काम "
        "करते और रहते हैं बहुत से उपयोगकर्ता हर दिन दस्तावेज़ पढ़ते और लिखते हैं "
        "जबकि दूसरे विज्ञान इतिहास और संस्कृति के बारे में जानकारी खोजते हैं आज "
        "मौसम ठंडा है लेकिन कल गर्म और धूप वाला होगा बच्चे स्कूल के बाद पार्क "
        "में खेलते हैं और परिवार शाम को खाने के लिए इकट्ठा होते हैं यह उन सबसे "
        "महत्वपूर्ण चीज़ों में से एक है जो हमने हाल के वर्षों में देखी हैं शहर "
        "में बहुत से पुराने घर और तंग गलियाँ हैं जहाँ संगीतकार खुले चौकों में "
        "बजाते हैं लोग बाज़ार से ताज़ी रोटी फल और मछली खरीदते हैं और बच्चे "
        "दुकानों के बीच हँसते हुए दौड़ते हैं जब वे घर लौटे तो काफ़ी देर हो चुकी "
        "थी"
    ),
    "mar": (
        "मुक्त सॉफ्टवेअरच्या वेगवान विकासाने लोक एकत्र कसे काम करतात आणि "
        "राहतात ते बदलले आहे अनेक वापरकर्ते दररोज कागदपत्रे वाचतात आणि लिहितात "
        "तर इतर विज्ञान इतिहास आणि संस्कृतीबद्दल माहिती शोधतात आज हवामान थंड "
        "आहे पण उद्या गरम आणि सूर्यप्रकाश असेल मुले शाळेनंतर उद्यानात खेळतात "
        "आणि कुटुंबे संध्याकाळी जेवणासाठी एकत्र येतात गेल्या काही वर्षांत आपण "
        "पाहिलेल्या सर्वात महत्त्वाच्या गोष्टींपैकी ही एक आहे शहरात अनेक जुनी "
        "घरे आणि अरुंद रस्ते आहेत जिथे संगीतकार खुल्या चौकांमध्ये वाजवतात लोक "
        "बाजारातून ताजी भाकरी फळे आणि मासे विकत घेतात आणि मुले दुकानांच्या "
        "मध्ये हसत धावतात ते घरी परतले तेव्हा बराच उशीर झाला होता"
    ),
    "nep": (
        "स्वतन्त्र सफ्टवेयरको छिटो विकासले मानिसहरू कसरी सँगै काम गर्छन् र "
        "बस्छन् भन्ने कुरा बदलेको छ धेरै प्रयोगकर्ताहरू हरेक दिन कागजातहरू "
        "पढ्छन् र लेख्छन् भने अरूहरू विज्ञान इतिहास र संस्कृतिका बारेमा "
        "जानकारी खोज्छन् आज मौसम चिसो छ तर भोलि तातो र घमाइलो हुनेछ "
        "बालबालिकाहरू विद्यालयपछि पार्कमा खेल्छन् र परिवारहरू साँझ खानाका "
        "लागि भेला हुन्छन् यो हामीले पछिल्ला वर्षहरूमा देखेका सबैभन्दा "
        "महत्त्वपूर्ण कुराहरूमध्ये एक हो सहरमा धेरै पुराना घरहरू र साँघुरा "
        "गल्लीहरू छन् जहाँ सङ्गीतकारहरू खुला चोकहरूमा बजाउँछन् मानिसहरू "
        "बजारबाट ताजा रोटी फलफूल र माछा किन्छन् र बालबालिकाहरू पसलहरूका "
        "बीचमा हाँस्दै दौडिन्छन् उनीहरू घर फर्कँदा निकै ढिलो भइसकेको थियो"
    ),
    # Hebrew script (heb/yid — Yiddish's די/דער/פון function words and
    # double-letter orthography):
    "heb": (
        "ההתפתחות המהירה של תוכנה חופשית שינתה את הדרך שבה אנשים "
        "עובדים וחיים יחד משתמשים רבים קוראים וכותבים מסמכים כל יום "
        "בעוד אחרים מחפשים מידע על מדע היסטוריה ותרבות מזג האוויר היום "
        "קר אבל מחר יהיה חם ושמשי הילדים משחקים בפארק אחרי בית הספר "
        "והמשפחות מתאספות בערב לארוחת ערב זה אחד הדברים החשובים ביותר "
        "שראינו בשנים האחרונות בעיר יש הרבה בתים ישנים ורחובות צרים "
        "שבהם מוזיקאים מנגנים בכיכרות הפתוחות אנשים קונים לחם טרי "
        "פירות ודגים בשוק והילדים רצים וצוחקים בין הדוכנים כבר היה "
        "מאוחר כשהם חזרו הביתה"
    ),
    "yid": (
        "די גיכע אנטוויקלונג פון פרייער ווייכווארג האט געביטן ווי אזוי "
        "מענטשן ארבעטן און לעבן צוזאמען א סך ניצערס לייענען און שרייבן "
        "דאקומענטן יעדן טאג בעת אנדערע זוכן אינפארמאציע וועגן "
        "וויסנשאפט געשיכטע און קולטור דער וועטער איז היינט קאלט אבער "
        "מארגן וועט זיין ווארעם און זוניק די קינדער שפילן זיך אין פארק "
        "נאך דער שול און די משפחות קומען זיך צונויף אין אוונט צום "
        "וועטשערע דאס איז איינע פון די וויכטיקסטע זאכן וואס מיר האבן "
        "געזען אין די לעצטע יארן אין שטאט זענען דא א סך אלטע הייזער "
        "און שמאלע געסלעך וואו מוזיקער שפילן אויף די אפענע פלעצער "
        "מענטשן קויפן פרישע ברויט פרוכטן און פיש אויפן מארק און די "
        "קינדער לויפן לאכנדיק צווישן די שטעלן עס איז שוין געווען שפעט "
        "ווען זיי זענען צוריקגעקומען אהיים"
    ),
}

LATIN_LANGS = (
    "afr", "aka", "aze", "cat", "ces", "dan", "deu", "eng", "epo", "est",
    "fin", "fra", "hrv", "hun", "ind", "ita", "jav", "lat", "lav", "lit",
    "nld", "nob", "pol", "por", "ron", "slk", "slv", "sna", "spa", "swe",
    "tgl", "tuk", "tur", "uzb", "vie", "zul",
)
CYRILLIC_LANGS = ("bel", "bul", "mkd", "rus", "srp", "ukr")
ARABIC_LANGS = ("ara", "pes", "urd")
DEVANAGARI_LANGS = ("hin", "mar", "nep")
HEBREW_LANGS = ("heb", "yid")

# single-language scripts (direct maps in detect_language_info)
_SCRIPT_MAPPED_LANGS = (
    "jpn", "kor", "cmn", "ell", "tha",
    "hye", "ben", "pan", "guj", "ori", "tam", "tel", "kan", "mal", "sin",
    "mya", "kat", "amh", "khm",
)
# whatlang's full 69-language inventory (Cargo.toml:168 / lang.rs)
ALL_LANGS = tuple(
    sorted(
        LATIN_LANGS + CYRILLIC_LANGS + ARABIC_LANGS + DEVANAGARI_LANGS
        + HEBREW_LANGS + _SCRIPT_MAPPED_LANGS
    )
)

_PROFILE_SIZE = 600

# ---------------------------------------------------------------------------
# Vectorized trigram machinery: codepoints map through a LUT to a small
# alphabet (letters seen in the training prose; other letters = OOV=1;
# everything else = word boundary 0); a trigram is the base-L code of
# three consecutive alphabet ids. Profile building and classification
# share this exact feature space, so the word-padding semantics (the
# Cavnar-Trenkle / whatlang method keeps leading/trailing-space trigrams
# but never cross-word ones) hold identically on both sides: trigrams
# with a boundary OR an OOV in the middle, or an OOV at either end, are
# dropped.
# ---------------------------------------------------------------------------
import numpy as np
import unicodedata as _ud

# letters PLUS combining marks: Devanagari matras/virama (Mn/Mc) are as
# language-bearing as consonants — dropping them would break nearly every
# Hindi/Marathi/Nepali trigram at a vowel sign
_ALPHABET = sorted({
    ch
    for ch in "".join(PROFILE_TEXT.values())
    if ch.isalpha() or _ud.category(ch) in ("Mn", "Mc")
})
_L = len(_ALPHABET) + 2
_MAXCP = max(ord(ch) for ch in _ALPHABET)
_LUT = np.zeros(_MAXCP + 1, dtype=np.int64)
# letter ranges below the LUT ceiling default to OOV; known letters override
for _lo, _hi in (
    (0x61, 0x7A),
    (0xC0, 0x24F),
    (0x250, 0x2AF),    # IPA extensions (Akan ɛ/ɔ, Azerbaijani ə)
    (0x370, 0x3FF),
    (0x400, 0x4FF),
    (0x530, 0x58F),    # Armenian
    (0x590, 0x5FF),    # Hebrew (heb/yid trigram family)
    (0x600, 0x6FF),    # Arabic (ara/pes/urd trigram family)
    (0x750, 0x77F),
    (0x900, 0x97F),    # Devanagari (hin/mar/nep trigram family)
    (0x1E00, 0x1EFF),  # Latin Extended Additional (Vietnamese diacritics)
):
    _LUT[_lo : min(_hi, _MAXCP) + 1] = 1
_LUT[0xD7] = _LUT[0xF7] = 0  # multiplication/division signs are not letters
for _i, _ch in enumerate(_ALPHABET):
    _LUT[ord(_ch)] = _i + 2


def _trigram_code_counts(text: str) -> tuple[np.ndarray, np.ndarray]:
    """(unique trigram codes, counts) of ``text`` in the shared feature
    space — one numpy pass, no per-char Python."""
    cp = np.frombuffer(text.lower().encode("utf-32-le"), dtype=np.uint32).astype(
        np.int64
    )
    if len(cp) < 3:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    ids = np.zeros(len(cp), dtype=np.int64)
    small = cp <= _MAXCP
    ids[small] = _LUT[cp[small]]
    ids[~small & (cp >= 0x80)] = 1  # unknown high letters/symbols -> OOV
    a, mid, b = ids[:-2], ids[1:-1], ids[2:]
    valid = (mid >= 2) & (a != 1) & (b != 1)
    codes = a[valid] * (_L * _L) + mid[valid] * _L + b[valid]
    return np.unique(codes, return_counts=True)


def _build_family(langs: tuple[str, ...]):
    """(code->row dict, (rows, len(langs)) column-normalized freq matrix)
    for one script family — classification is then one sparse gather +
    one small matmul. Profile frequencies are IDF-weighted within the
    family: trigrams every language shares (" de", " en", …) carry little
    identity, while language-specific ones (å/ø/ß/ř-bearing, distinctive
    endings) decide — the same discriminative weighting whatlang's trained
    trigram ranks encode."""
    per_lang = []
    union: dict[int, int] = {}
    df: dict[int, int] = {}
    for lang in langs:
        codes, counts = _trigram_code_counts(PROFILE_TEXT[lang])
        order = np.argsort(-counts, kind="stable")[:_PROFILE_SIZE]
        codes, counts = codes[order], counts[order]
        per_lang.append((codes, counts / counts.sum()))
        for c in codes.tolist():
            union.setdefault(c, len(union))
            df[c] = df.get(c, 0) + 1
    n = len(langs)
    m = np.zeros((len(union), n))
    for li, (codes, freq) in enumerate(per_lang):
        idf = np.array([0.25 + np.log(n / df[c]) for c in codes.tolist()])
        w = freq * idf
        w = w / np.sqrt((w**2).sum())  # pre-normalize the column
        for c, f in zip(codes.tolist(), w.tolist()):
            m[union[c], li] = f
    return union, m


_FAMILIES = {
    "latin": (_build_family(LATIN_LANGS), LATIN_LANGS),
    "cyrillic": (_build_family(CYRILLIC_LANGS), CYRILLIC_LANGS),
    "arabic": (_build_family(ARABIC_LANGS), ARABIC_LANGS),
    "devanagari": (_build_family(DEVANAGARI_LANGS), DEVANAGARI_LANGS),
    "hebrew": (_build_family(HEBREW_LANGS), HEBREW_LANGS),
}

# (script, start, end) Unicode ranges — counted like whatlang's
# script_detection tables (language_detection.rs / whatlang scripts.rs)
_SCRIPT_RANGES = (
    ("cyrillic", 0x0400, 0x04FF),
    ("hiragana", 0x3040, 0x309F),
    ("katakana", 0x30A0, 0x30FF),
    ("han", 0x4E00, 0x9FFF),
    ("hangul", 0xAC00, 0xD7A3),
    ("greek", 0x0370, 0x03FF),
    ("arabic", 0x0600, 0x06FF),
    ("hebrew", 0x0590, 0x05FF),
    ("thai", 0x0E00, 0x0E7F),
    ("devanagari", 0x0900, 0x097F),
    # whatlang-parity single-language scripts (round 4):
    ("armenian", 0x0530, 0x058F),
    ("bengali", 0x0980, 0x09FF),
    ("gurmukhi", 0x0A00, 0x0A7F),
    ("gujarati", 0x0A80, 0x0AFF),
    ("oriya", 0x0B00, 0x0B7F),
    ("tamil", 0x0B80, 0x0BFF),
    ("telugu", 0x0C00, 0x0C7F),
    ("kannada", 0x0C80, 0x0CFF),
    ("malayalam", 0x0D00, 0x0D7F),
    ("sinhala", 0x0D80, 0x0DFF),
    ("myanmar", 0x1000, 0x109F),
    ("georgian", 0x10A0, 0x10FF),
    ("ethiopic", 0x1200, 0x137F),
    ("khmer", 0x1780, 0x17FF),
)


# scripts that map to exactly one whatlang language (scripts.rs tables)
_SINGLE_LANG_SCRIPTS = {
    "armenian": "hye",
    "bengali": "ben",
    "gurmukhi": "pan",
    "gujarati": "guj",
    "oriya": "ori",
    "tamil": "tam",
    "telugu": "tel",
    "kannada": "kan",
    "malayalam": "mal",
    "sinhala": "sin",
    "myanmar": "mya",
    "georgian": "kat",
    "ethiopic": "amh",
    "khmer": "khm",
}


def detect_script(text: str) -> tuple[str, int, int]:
    """Dominant script -> (script, count, total_letters) — fully
    vectorized (one numpy pass over the codepoints; the per-char Python
    loop was the extraction pipeline's second-biggest cost). Latin =
    ASCII letters + Latin-1/Extended letters (U+00C0-U+024F minus the
    two arithmetic signs)."""
    import numpy as np

    cp = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)
    if len(cp) == 0:
        return "und", 0, 0
    latin = (
        ((cp >= 0x41) & (cp <= 0x5A))
        | ((cp >= 0x61) & (cp <= 0x7A))
        | ((cp >= 0xC0) & (cp <= 0x24F) & (cp != 0xD7) & (cp != 0xF7))
        # Latin Extended Additional (Vietnamese diacritics) — keep in sync
        # with the trigram LUT ranges above
        | ((cp >= 0x1E00) & (cp <= 0x1EFF))
    )
    counts: dict[str, int] = {}
    n_latin = int(latin.sum())
    if n_latin:
        counts["latin"] = n_latin
    total = n_latin
    for name, lo, hi in _SCRIPT_RANGES:
        n = int(((cp >= lo) & (cp <= hi)).sum())
        if n:
            counts[name] = n
        total += n
    if not counts:
        return "und", 0, 0
    best = max(sorted(counts), key=lambda k: counts[k])
    return best, counts[best], total


def _classify_trigrams(sample: str, family: str) -> tuple[str, float]:
    """argmax language by cosine similarity between the sample's trigram
    frequencies and each language profile; confidence = normalized margin
    over the runner-up (whatlang's confidence shape). Deterministic: the
    family's language tuple is ordered, ties keep the earlier language."""
    (code2row, m), langs = _FAMILIES[family]
    codes, counts = _trigram_code_counts(sample[:_TRIGRAM_SAMPLE_CHARS])
    if len(codes) == 0:
        return "und", 0.0
    rows = np.fromiter(
        (code2row.get(c, -1) for c in codes.tolist()), dtype=np.int64, count=len(codes)
    )
    hit = rows >= 0
    if not hit.any():
        return "und", 0.0
    # sqrt-damped counts: raw counts let a single ultra-frequent trigram
    # ("en ", " de") override every distinctive one; sqrt keeps frequency
    # information without that failure mode (whatlang's rank-based
    # distance has the same damping effect)
    w = np.sqrt(counts.astype(np.float64))
    scores = w[hit] @ m[rows[hit]] / np.sqrt((w**2).sum())
    best_i = int(scores.argmax())  # first max wins -> deterministic ties
    best = float(scores[best_i])
    if best <= 0.0:
        return "und", 0.0
    scores[best_i] = -1.0
    second = float(scores.max()) if len(scores) > 1 else 0.0
    return langs[best_i], (best - max(second, 0.0)) / best


def detect_language_info(text: str | None) -> tuple[str, str, float]:
    """(iso639-3 lang, script, confidence in [0,1])."""
    if not text:
        return "und", "und", 0.0
    sample = text[:MAX_SAMPLE_CHARS]
    script, script_n, total = detect_script(sample)
    if script == "und":
        return "und", "und", 0.0
    dominance = script_n / total if total else 0.0
    # single-language scripts map directly (whatlang does the same for
    # e.g. Hangul/Greek; kana unambiguously marks Japanese even in
    # kanji-heavy text)
    if script in ("hiragana", "katakana"):
        return "jpn", script, dominance
    if script == "han":
        # han + any kana = Japanese; pure han = Mandarin
        import numpy as np

        cp = np.frombuffer(sample.encode("utf-32-le"), dtype=np.uint32)
        if bool(((cp >= 0x3040) & (cp <= 0x30FF)).any()):
            return "jpn", script, dominance
        return "cmn", script, dominance
    if script == "hangul":
        return "kor", script, dominance
    if script == "greek":
        return "ell", script, dominance
    if script == "thai":
        return "tha", script, dominance
    single = _SINGLE_LANG_SCRIPTS.get(script)
    if single is not None:
        return single, script, dominance
    family_default = {
        "cyrillic": "rus",
        "arabic": "ara",
        "devanagari": "hin",
        "hebrew": "heb",
    }
    if script in family_default:
        lang, conf = _classify_trigrams(sample, script)
        return (
            (lang, script, conf)
            if lang != "und"
            else (family_default[script], script, 0.3)
        )
    lang, conf = _classify_trigrams(sample, "latin")
    return lang, script, conf


def detect_language(text: str | None) -> str:
    return detect_language_info(text)[0]
