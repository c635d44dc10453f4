"""Krovetz (kstem) dictionary tables.

Extracted from the reference's stem_krovetz.c data arrays
(source/stem_krovetz.c:1340-23136 — originally the kstem flat
files exception_words.txt / direct_conflations.txt /
country_nationality.txt / head_word_list.txt / dict_supplement.txt
/ proper_nouns.txt from the Lemur/INQUERY distribution).  Pure
data, same adjudication as the Dale-Chall word list; the
algorithm lives in kernels/kstem.py.
"""

# words stemmed to themselves even when inflection rules would
# otherwise apply (kstem_add_table_entry(..., exc=True))
EXCEPTIONS = (
    "aids aide bathe caste cute dame dime doge done dune envelope gage "
    "grille grippe lobe mane mare nape node pane pate plane pope "
    "programme quite ripe rote rune sage severe shoppe sine slime snipe "
    "steppe suite swinge tare tine tope tripe twine "
)

# direct variant -> root conflations (mostly nationalities)
CONFLATIONS = (
    ("afghan", "afghanistan"),
    ("african", "africa"),
    ("albanian", "albania"),
    ("algerian", "algeria"),
    ("american", "america"),
    ("andorran", "andorra"),
    ("angolan", "angola"),
    ("arabian", "arabia"),
    ("argentine", "argentina"),
    ("armenian", "armenia"),
    ("asian", "asia"),
    ("australian", "australia"),
    ("austrian", "austria"),
    ("azerbaijani", "azerbaijan"),
    ("azeri", "azerbaijan"),
    ("bangladeshi", "bangladesh"),
    ("belgian", "belgium"),
    ("bermudan", "bermuda"),
    ("bolivian", "bolivia"),
    ("bosnian", "bosnia"),
    ("botswanan", "botswana"),
    ("brazilian", "brazil"),
    ("british", "britain"),
    ("bulgarian", "bulgaria"),
    ("burmese", "burma"),
    ("californian", "california"),
    ("cambodian", "cambodia"),
    ("canadian", "canada"),
    ("chadian", "chad"),
    ("chilean", "chile"),
    ("chinese", "china"),
    ("colombian", "colombia"),
    ("croat", "croatia"),
    ("croatian", "croatia"),
    ("cuban", "cuba"),
    ("cypriot", "cyprus"),
    ("czechoslovakian", "czechoslovakia"),
    ("danish", "denmark"),
    ("egyptian", "egypt"),
    ("equadorian", "equador"),
    ("eritrean", "eritrea"),
    ("estonian", "estonia"),
    ("ethiopian", "ethiopia"),
    ("european", "europe"),
    ("fijian", "fiji"),
    ("filipino", "philippines"),
    ("finnish", "finland"),
    ("french", "france"),
    ("gambian", "gambia"),
    ("georgian", "georgia"),
    ("german", "germany"),
    ("ghanian", "ghana"),
    ("greek", "greece"),
    ("grenadan", "grenada"),
    ("guamian", "guam"),
    ("guatemalan", "guatemala"),
    ("guinean", "guinea"),
    ("guyanan", "guyana"),
    ("haitian", "haiti"),
    ("hawaiian", "hawaii"),
    ("holland", "dutch"),
    ("honduran", "honduras"),
    ("hungarian", "hungary"),
    ("icelandic", "iceland"),
    ("indonesian", "indonesia"),
    ("iranian", "iran"),
    ("iraqi", "iraq"),
    ("iraqui", "iraq"),
    ("irish", "ireland"),
    ("israeli", "israel"),
    ("italian", "italy"),
    ("jamaican", "jamaica"),
    ("japanese", "japan"),
    ("jordanian", "jordan"),
    ("kampuchean", "cambodia"),
    ("kenyan", "kenya"),
    ("korean", "korea"),
    ("kuwaiti", "kuwait"),
    ("lankan", "lanka"),
    ("laotian", "laos"),
    ("latvian", "latvia"),
    ("lebanese", "lebanon"),
    ("liberian", "liberia"),
    ("libyan", "libya"),
    ("lithuanian", "lithuania"),
    ("macedonian", "macedonia"),
    ("madagascan", "madagascar"),
    ("malaysian", "malaysia"),
    ("maltese", "malta"),
    ("mauritanian", "mauritania"),
    ("mexican", "mexico"),
    ("micronesian", "micronesia"),
    ("moldovan", "moldova"),
    ("monacan", "monaco"),
    ("mongolian", "mongolia"),
    ("montenegran", "montenegro"),
    ("moroccan", "morocco"),
    ("myanmar", "burma"),
    ("namibian", "namibia"),
    ("nepalese", "nepal"),
    ("netherlands", "dutch"),
    ("nicaraguan", "nicaragua"),
    ("nigerian", "nigeria"),
    ("norwegian", "norway"),
    ("omani", "oman"),
    ("pakistani", "pakistan"),
    ("panamanian", "panama"),
    ("papuan", "papua"),
    ("paraguayan", "paraguay"),
    ("peruvian", "peru"),
    ("portuguese", "portugal"),
    ("romanian", "romania"),
    ("rumania", "romania"),
    ("rumanian", "romania"),
    ("russian", "russia"),
    ("rwandan", "rwanda"),
    ("samoan", "samoa"),
    ("scottish", "scotland"),
    ("serb", "serbia"),
    ("serbian", "serbia"),
    ("siam", "thailand"),
    ("siamese", "thailand"),
    ("slovakia", "slovak"),
    ("slovakian", "slovak"),
    ("slovenian", "slovenia"),
    ("somali", "somalia"),
    ("somalian", "somalia"),
    ("spanish", "spain"),
    ("swedish", "sweden"),
    ("swiss", "switzerland"),
    ("syrian", "syria"),
    ("taiwanese", "taiwan"),
    ("tanzanian", "tanzania"),
    ("texan", "texas"),
    ("thai", "thailand"),
    ("tunisian", "tunisia"),
    ("turkish", "turkey"),
    ("ugandan", "uganda"),
    ("ukrainian", "ukraine"),
    ("uruguayan", "uruguay"),
    ("uzbek", "uzbekistan"),
    ("venezuelan", "venezuela"),
    ("vietnamese", "viet"),
    ("virginian", "virginia"),
    ("yemeni", "yemen"),
    ("yugoslav", "yugoslavia"),
    ("yugoslavian", "yugoslavia"),
    ("zambian", "zambia"),
    ("zealander", "zealand"),
    ("zimbabwean", "zimbabwe"),
    ("aging", "age"),
    ("going", "go"),
    ("goes", "go"),
    ("lying", "lie"),
    ("using", "use"),
    ("owing", "owe"),
    ("suing", "sue"),
    ("dying", "die"),
    ("tying", "tie"),
    ("vying", "vie"),
    ("aged", "age"),
    ("used", "use"),
    ("vied", "vie"),
    ("cued", "cue"),
    ("died", "die"),
    ("eyed", "eye"),
    ("hued", "hue"),
    ("iced", "ice"),
    ("lied", "lie"),
    ("owed", "owe"),
    ("sued", "sue"),
    ("toed", "toe"),
    ("tied", "tie"),
    ("does", "do"),
    ("doing", "do"),
    ("aeronautical", "aeronautics"),
    ("mathematical", "mathematics"),
    ("political", "politics"),
    ("metaphysical", "metaphysics"),
    ("cylindrical", "cylinder"),
    ("nazism", "nazi"),
    ("ambiguity", "ambiguous"),
    ("barbarity", "barbarous"),
    ("credulity", "credulous"),
    ("generosity", "generous"),
    ("spontaneity", "spontaneous"),
    ("unanimity", "unanimous"),
    ("voracity", "voracious"),
)

# the kstem head-word lexicon (a word found here is left alone)
_HEADWORDS_TEXT = """\
a aback abacus abalone abandon abase abash abate abater abbas abbe
abbey abbot abbreviate abc abdicate abdomen abdominal abduct abed
aberrant aberrate abet abetted abetting abeyance abeyant abhorred
abhorrent abide abject ablate ablative ablaze able ablution abnormal
aboard abode abolish abolition abominable abominate aboriginal
aborigine aborning abort abound about above aboveboard aboveground
abovementioned abrade abrasion abrasive abreact abreast abridge
abridgment abroad abrogate abrupt abscess abscissa abscissae absence
absent absentee absenteeism absentia absentminded absinthe absolute
absolution absolutism absolve absorb absorbent absorption absorptive
abstain abstention abstinent abstract abstracter abstractor abstruse
absurd abuilding abundant abusable abuse abusive abut abutment abutted
abutting abysmal abyss academe academia academic academician academy
acanthus accede accelerate accelerometer accent accentual accentuate
accept acceptant acceptor access accessible accession accessory
accident accidental accipiter acclaim acclamation acclimate acclivity
accolade accommodate accompaniment accompanist accompany accomplice
accomplish accord accordant accordingly accordion accost account
accountable accountant accoutrements accredit accreditate
accreditation accretion accrual accrue acculturate accumulate
accumulator accuracy accurate accursed accusation accusative
accusatory accuse accustom ace acerbic acerbity acetate acetic acetone
acetylene ache achieve aching achromatic acid acidic acidulated
acidulous acknowledge acknowledgeable acme acolyte acorn acoustic
acquaint acquaintance acquiesce acquiescent acquire acquisition
acquisitive acquit acquittal acquitting acre acreage acrid acrimonious
acrimony acrobacy acrobat acrobatic acronym across acrylate acrylic
act actinic actinide actinism actinium actinolite actinometer action
activate activation active activism activity actor actress actual
actuarial actuate acuity acumen acute acyclic ad adage adagio adamant
adapt adaptation adaptive add added addend addenda addendum adder
addict addition additional additive addle address addressee adduce
adenine adenoids adenoma adenosine adept adequacy adequate adhere
adherent adhesion adhesive adiabatic adieu adipic adjacent adject
adjectival adjective adjoin adjoint adjourn adjudge adjudicate adjunct
adjust adjutant administer administrable administrate administratrix
admiral admiralty admiration admire admissible admission admit
admittance admitted admitting admix admixture admonish admonition ado
adobe adolescent adopt adoption adoptive adore adorn adposition
adrenal adrenaline adrift adroit adsorb adsorbate adsorption
adsorptive adulate adult adulterate adulterous adultery adulthood
advance advantage advantageous advent adventitious adventure
adventurous adverb adverbial adversary adverse advert advertise advice
advisable advise advisedly advisee advisor advisory advocacy advocate
aegis aeolian aerate aerial aerobic aerodynamic aerogene aeronautic
aeronautics aerosol aerospace aesthete aesthetic afar affable affair
affect affectate affectation affection affectionate afferent affiance
affidavit affiliate affine affinity affirm affirmation affirmative
affix afflict affluence affluent afford afforest afforestation
affricate affront aficionado afield afire aflame afloat afoot
aforementioned aforesaid aforethought afoul afraid afresh afrikaans
afro aft after aftereffect afterglow afterimage afterlife aftermath
afternoon afterthought afterward afterwards afterword again against
agate agave age agenda agent agglomerate agglutinate agglutinin
aggravate aggregate aggression aggressive aggressor aggrieve aggrieved
aghast agile agitate agleam agnomen agnostic ago agone agony agouti
agrarian agree agreeable agreed agreeing agribusiness agricultural
agriculture agrimony ague ah ahead ahem ahoy aid ail ailanthus aile
aileron aim air airbed airborne airbus aircraft airdrop airedale
airfare airfield airflow airfoil airframe airlift airline airlock
airmail airman airmass airmen airpark airplane airport airspace
airspeed airstrip airtight airway airy aisle ajar akin ala alabaster
alacrity alai alan alarm alas alb alba albacore albatross albeit album
albumin alchemy alcohol alcoholic alcoholism alcove aldehyde alder
alderman aldermen aldrin ale aleph alert alewife alfalfa alfonso
alfresco alga algae algaecide algal algebra algebraic alginate
algorithm algorithmic alia alias alibi alien alienate alight align
alike alimony aliphatic aliquot alive alizarin alkali alkaline
alkaloid alkane alkene all allay allegate allegation allege allegedly
allegiant allegoric allegory allegro allele allemand allergic allergy
alleviate alley alleyway alliance allied alligator alliterate
allocable allocate allot allotropic allotted allotting allow allowance
alloy allspice allude allure allusion allusive alluvial alluvium ally
allyl alma almagest almanac almighty almond almost alms aloe aloft
aloha alone along alongside aloof aloud alp alpenstock alpha alphabet
alphabetic alphameric alphanumeric alpine already also altar alter
alterate alteration altercate alterman altern alternate alternator
althea although altimeter altitude alto altogether altruism altruist
alum alumina aluminate alumna alumnae alumni alumnus alundum alveolar
alveoli alveolus alway always alyssum am amalgam amalgamate amanita
amanuensis amaranth amass amateur amateurish amatory amaze ambassador
amber ambergris ambiance ambidextrous ambient ambiguous ambition
ambitious ambivalent amble ambling ambrose ambrosia ambrosial ambulant
ambulate ambulatory ambuscade ambush ameliorate amen amenable amend
amenity americium amethyst amethystine ami amicable amid amide
amidships amidst amigo amino aminobenzoic amiss amity ammeter ammo
ammonia ammoniac ammonium ammunition amnesia amoeba amoebae amok among
amongst amoral amorous amorphous amort amount amp amperage ampere
ampersand amphetamine amphibian amphibious amphibole amphibology
amphioxis ample amplifier amplify amplitude amply amputate amputee
amra amulet amuse amy amygdaloid an ana anachronism anachronistic
anaconda anaerobic anaglyph anagram anal analeptic analgesic analogize
analogous analogue analogy analyses analysis analyst analytic
anamorphic anaplasmosis anarch anarchic anarchism anarchy anastigmat
anastigmatic anastomosis anastomotic anathema anatomic anatomy
ancestor ancestral ancestry anchor anchorage anchorite anchoritism
anchovy ancient ancillary and andesine andesite andiron anecdotal
anecdote anemone anent anew angel angelfish angelic angelus anger
angiosperm angle anglicism angling angry angst angstrom anguish
angular anharmonic anhydride anhydrite anhydrous ani aniline
animadversion animadvert animal animate animism animosity animus anion
anionic anis anise aniseikonic anisotropic anisotropy ankle annal
annals anneal annex annihilate anniversary annotate announce annoy
annoyance annual annuity annul annular annuli annulled annulling
annulus annum annunciate anode anodic anomalous anomaly anomie
anonymity anonymous anopheles anorexia anorthic anorthite anorthosite
another answer answerable ant antacid antagonism antagonist
antagonistic antarctic ante anteater antebellum antecedent antedate
antelope antenna antennae anterior anteroom anthem anther anthology
anthracite anthracnose anthropogenic anthropology anthropomorphic
anthropomorphism anti antic anticipate anticipatory anticlerical
antigen antigorite antimony antipasto antipathy antiperspirant
antiphonal antipode antipodean antipodes antiquarian antiquary
antiquated antique antiquity antisemite antisemitic antisemitism
antithesis antithetic antler antonym anus anvil anxiety anxious any
anybody anyhow anyone anyplace anything anyway anywhere aorta apace
apache apart apartheid apartment apathetic apathy apatite ape
aperiodic aperture apex aphasia aphasic aphelion aphid aphorism apices
apiece aplomb apocalypse apocalyptic apocryphal apogee apologetic
apologia apology apostate apostle apostolic apostrophe apothecary
apothegm apotheosis appall appanage apparatus apparel apparent
apparition appeal appear appearance appeasable appease appellant
appellate appellation append appendage appendices appendicitis
appendix apperception appertain appetite appetizer appetizing applaud
applause apple applejack appliance applicable applicant applicate
application applicator applied applique apply appoint appointee apport
apportion apposite apposition appraisal appraise appreciable
appreciate apprehend apprehension apprehensive apprentice apprise
approach approbation appropriable appropriate approval approve
approximable approximant approximate apricot apron apropos apse apt
aptitude aqua aquarium aquarius aquatic aqueduct aqueous arabesque
arable arachnid arbiter arbitrage arbitrary arbitrate arboreal
arboretum arbutus arc arcade arcana arcane arccos arccosine arch
archae archaic archaism archangel archbishop archdiocese archenemy
archeology archer archery archetype archetypical archfool arching
archipelago architect architectonic architectural architecture
archival archive arcing arclength arcsin arcsine arctan arctangent
arctic ardency ardent arduous are area areaway areawide arena
arenaceous argillaceous arginine argo argon argot argue argument
argumentation argumentative arhat arid aries arise arisen aristocracy
aristocrat aristocratic arithmetic ark arm armada armadillo armament
armature armchair armful armhole armillaria armistice armload armoire
armor armorial armpit army aroma aromatic arose around arousal arouse
arpeggio arquebus arrack arraign arrange arrangeable arras array
arrear arrears arrest arrival arrive arrogant arrogate arrow arrowhead
arrowroot arroyo arsenal arsenate arsenic arsenide arsine arson art
artemisia arterial arteriole arteriolosclerosis arteriosclerosis
artery artful arthritis artichoke article articulate articulatory
artifact artifice artificer artificial artillery artisan artistry
artwork arty arum aryl as asbestos ascend ascendant ascension ascent
ascertain ascetic asceticism ascomycetes ascribe ascription asepsis
aseptic asexual ash ashame ashamed ashen ashman ashmen ashore ashtray
ashy aside asinine ask askance askew asleep asocial asparagine
asparagus aspartic aspect aspen asperity aspersion asphalt aspheric
asphyxiate aspic aspidistra aspirant aspirate aspire aspirin asplenium
ass assai assail assailant assassin assassinate assault assay
assemblage assemble assent assert assess assessor asset assiduity
assiduous assign assignation assignee assimilable assimilate assist
assistant assize associable associate assonant assort assortment
assuage assume assumption assurance assure astatine aster asteria
asterisk asteroid asteroidal asthma astigmat astigmatic astigmatism
astonish astound astraddle astral astray astride astringent astrology
astronaut astronautic astronomer astronomic astronomy astrophysical
astrophysicist astrophysics astute asunder asylum asymmetry asymptote
asymptotic asynchronous asynchrony at atavism atavistic ate atheism
atheist athlete athletic athwart atlantes atlantic atlas atmosphere
atmospheric atom atomic atomize atonal atone atop atrium atrocious
atrocity atrophic atrophy attach attack attain attainder attempt
attend attendant attendee attention attentive attenuate attest
attestation attic attire attitude attitudinal attorney attract
attribute attribution attributive attrition attune atypic atypical
auburn auction auctioneer audacious audacity audible audience audio
audiotape audiovisual audit audition auditor auditorium auditory
augend auger augite augment augmentation augur august auk aunt auntie
aura aural aureomycin auric aurochs aurora auspices auspicious
austenite austere australite authentic authenticate author
authoritarian authoritative authority authorize autism autistic auto
autobiography autoclave autocollimate autocorrelate autocracy autocrat
autocratic autoeroticism autograph automat automata automate automatic
automatism automaton automobile automorphic automorphism automotive
autonomic autonomous autonomy autopsy autosuggestible autotransformer
autumn autumnal auxiliary avail available avalanche avarice avaricious
avenge avenue aver average averred averring averse aversion aversive
avert avertive aviary aviate aviatrix avid avionic avocado avocate
avocation avocet avoid avoidance avoirdupois avow avowal avuncular
await awake awaken award aware awash away awe awesome awful awfully
awhile awkward awl awn awning awoke awry ax axe axes axial axiology
axiom axiomatic axis axisymmetric axle axolotl axon aye azalea azimuth
azimuthal azure b babbitt babble babe baboon baby babyhood babysat
babysit babysitter babysitting baccalaureate baccarat bachelor bacilli
bacillus back backboard backbone backbreaking backdrop backfill
backgammon background backhand backlash backlog backorder backpack
backplane backplate backscatter backside backspace backstage
backstairs backstitch backstop backtrack backup backward backwater
backwood backwoods backyard bacon bacteria bacterial bacterium bad
bade badge badger badinage badland badminton baffle bag bagatelle
bagel baggage bagging baggy bagpipe bagpipes bah bail bailiff bainite
bait baize bake bakery baklava balance balcony bald baldly baldpate
baldy bale baleen baleful balk balky ball ballad ballast balled
ballerina ballet balletic balletomane ballfield ballocks balloon
ballot ballroom bally ballyhoo balm balmy balsa balsam balustrade bam
bamboo ban banal banana band bandage bandgap bandit bandpass bandstand
bandstop bandwagon bandwidth bandy bane baneberry baneful bang banger
bangkok bangle banish banister banjo bank bankrupt bankruptcy banner
banns banquet banshee bantam banter baptism baptismal baptistery bar
barb barbarian barbaric barbarism barbarous barbecue barbell barber
barberry barbital barbiturate barbudo bard bare barefaced barefoot
bareheaded barelegged barfly bargain barge baritone barium bark
barkeep barker barley barn barnacle barnstorm barnyard barometer baron
baroness baronet baronial barony baroque barrack barracuda barrage
barre barrel barren barrette barricade barrier barrow bartend
bartender barter barycentric basal basalt base baseball baseband
baseboard baseline baseman basemen basement baseplate basepoint bash
bashaw bashful basic basidiomycetes basil basilar basilisk basin basis
bask basket basketball basophilic bass bassi bassinet basso basswood
bastard bastardize baste bastion bat batch bate bateau bater bath
bathos bathrobe bathroom bathtub batik baton batt battalion batten
battery battle battlefield battlefront battleground batwing bauble
baud bauxite bawd bawdy bawl bay bayberry bayed bayonet bayou bazaar
be beach beachcomb beachhead beacon bead beadle beady beak beaker beam
bean bear bearberry beard bearish beast beastie beastly beat beaten
beater beatific beatification beatify beatitude beatnik beau
beaujolais beauteous beautiful beautify beauty beaux beaver bebop
becalm becalmed became because beck becket beckon becloud become bed
bedazzle bedbug bedclothes bedding bedevil bedewed bedfast bedim
bedimmed bedimming bedlam bedpost bedraggle bedraggled bedridden
bedrock bedroom bedside bedspread bedspring bedstraw bedtime bee
beebread beech beechwood beef beefsteak beefy beehive been beep beer
beet beetle beeves befall befallen befell befit befitting befog
befogging before beforehand befoul befuddle beg began beget begetting
beggar beggary begging begin beginner beginning begonia begotten
begrudge beguile begun behalf behave behavioral behead beheld behest
behind behold beige being bel belate belated belch belfry belie belief
belies believe belittle bell belladonna bellboy belle bellflower
bellhop bellicose belligerent bellman bellmen bellow bellum bellwether
belly bellyache bellyfull belong belove beloved below belt belvedere
belvidere belying bemadden beman bemoan bemuse bemused bench benchmark
bend beneath benediction benedictus benefactor benefice beneficent
beneficial beneficiary benefit benevolent benight benighted benign
bent benthic benumbed benzene beplaster bequeath bequest berate
bereave bereft beret berg bergamot beribbon beriberi berkelium berne
berry berserk berth beryl beryllium beseech beset besetting beside
besiege besmirch besotted bespattered bespeak bespectacled bespoke
best bestial bestir bestirring bestow bestowal bestseller bestselling
bestubble bet beta betatron betel beth bethel bethought betide betimes
betoken betony betray betrayal betrayer betroth betrothal better
bettor between betwixt bevel beverage bevy bewail beware bewhisker
bewilder bewitch bey beyond bezel bhoy bianco bias biaxial bib bibb
bible biblical bibliography bibliophile bicameral bicarbonate
bicentennial bicep biceps bichromate bicker biconcave biconnected
bicycle bid biddable bidden biddy bide bidiagonal bidirectional bien
biennial biennium bier bifocal bifocals bifurcate big bigot bigotry
biharmonic bijection bijective bijouterie bike bikini bilabial
bilateral bilayer bile bilge bilharziasis bilinear bilingual bilk bill
billboard billet billfold billiard billion billionth billow billy
bimetallic bimetallism bimodal bimolecular bimonthly bin binary
binaural bind bindery bindle bindweed bing binge bingle binocular
binomial binuclear biochemic biography biology biomedical biometry
biopsy biota biotic biotite bipartisan bipartite biped biplane bipolar
biracial birch bird birdbath birdie birdlike birdseed birdwatch
birefringent birth birthday birthplace birthright biscuit bisect
bisexual bishop bishopric bismuth bison bisque bistable bistate bit
bitch bite bitnet bitt bitten bitter bittern bitternut bitterroot
bittersweet bitumen bituminous bitwise bivalve bivariate bivouac
biweekly biz bizarre blab blabber black blackball blackberry blackbird
blackboard blackbody blacken blackjack blackmail blackout blacksmith
bladder bladdernut bladderwort blade blame blameworthy blanc blanch
bland blandish blandishments blank blanket blare blaspheme blasphemous
blasphemy blast blastula blat blatant blather blaze blazer blazon
bleach bleak bleary bleat bled bleed bleeding blemish blend bless
blest blew blight blighter blimp blind blindfold blink blinkered blip
bliss blissful blister blithe blithering blitz blizzard bloat bloated
blob bloc block blockade blockage blockhouse blocky bloke blond blonde
blood bloodbath bloodcurdling bloodhound bloodletting bloodline
bloodroot bloodshed bloodshot bloodstain bloodstone bloodstream bloody
bloom bloomer bloop blossom blot blotch blouse blow blowback blowfish
blowfly blown blowup blubber bludgeon blue blueback blueberry bluebill
bluebird bluebonnet bluebook bluebush bluefish bluegill bluegrass
bluejacket blueprint bluestocking bluet bluff bluish blunder blunt
blur blurb blurry blurt blush bluster blustery blutwurst boa boar
board boardinghouse boast boastful boat boater boathouse boatload
boatman boatmen boatswain boatyard bob bobbin bobble bobby bobcat
bobolink bock bocklogged bode bodhisattva bodice bodied body bodybuild
bodybuilder bodybuilding bodyguard bog bogey bogeymen bogging boggle
boggy bogus bogy boil boisterous bold boldface bole boletus bolivar
bollocks bolo bolometer bolshevism bolster bolt bomb bombard bombast
bombastic bombproof bon bona bonanza bond bondage bondholder bondsman
bondsmen bone boner bonfire bong bongo bonito bonkers bonnet bonus
bony bonze boo booby boogie book bookbind bookbinding bookcase bookend
bookie bookish bookkeep bookkeeping booklet bookmobile bookplate
bookseller bookshelf bookshelves bookstore booky boolean boom
boomerang boon boor boorish boost boot booth bootleg bootlegged
bootlegger bootlegging bootstrap bootstrapped bootstrapping bootstraps
booty booze bop bopper borate borax bordello border borderland
borderline bore boredom boric born borne boron borosilicate borough
borrow bosom boson bosonic boss botanic botanist botany botch botfly
both bother bothersome bottle bottleneck bottom bottommost botulin
botulism bouffant bough bought boulder boule boulevard bounce bouncy
bound boundary bounder bounty bouquet bourbon bourgeois bourgeoisie
bourn boustrophedon bout boutique bovine bow bowel bower bowfin bowie
bowl bowline bowman bowmen bowstring box boxcar boxwood boxy boy boyar
boycott boyfriend boyhood boyish brace bracelet bracken bracket
brackish bract brad brae brag braggart bragging braid brain brainchild
brainchildren brainstorm brainwash brainy brake brakeman bramble bran
branch brand brandish brandy brandywine brant brash brass brassiere
brassy bratwurst bravado brave bravery bravo bravura brawl bray brazen
brazier breach bread breadboard breadfruit breadroot breadth
breadthways breadwinner break breakage breakaway breakdown breaker
breakfast breakoff breakpoint breakthrough breakup breakwater bream
breast breastplate breastwork breath breathe breathtaking breathy
breccia bred breech breeches breed breeding breeze breezy
bremsstrahlung brethren breve brevet brevity brew brewery briar bribe
bribery brick brickbat bricklay bricklayer bricklaying bridal bride
bridegroom bridesmaid bridge bridgeable bridgehead bridgework bridle
brief briefcase brier brig brigade brigadier brigantine bright
brighten brilliant brim brimful brimstone brindle brindled brine bring
brink brinkmanship briny brisk bristle bristols britches brittle
broach broad broadcast broaden broadloom broadminded broadside
broadways brocade broccoli brochure brockle broil broke broken broker
brokerage brolly bromide bromine bronchi bronchial bronchiolar
bronchiole bronchitis bronchus bronco brontosaurus bronze bronzy brood
broody brook brookside broom broomcorn broth brothel brother
brotherhood brought brouhaha brow browbeaten brown brownie brownish
browse brucellosis bruise bruiser bruit brunch brunette brunt brush
brushfire brushlike brushwork brushy brusque brussels brutal brute
bryophyta bryophyte bryozoa bub bubble buck buckaroo buckboard bucket
bucketfull buckeye buckhorn buckle buckler buckshot buckskin buckthorn
buckwheat bucolic bud buddhism buddy budge budget budgetary buff
buffalo buffer buffet bufflehead buffoon bug bugaboo bugeyed bugger
bugging buggy bugle build buildup built builtin bulb bulblet bulge
bulk bulkhead bulky bull bulldog bulldoze bullet bulletin bullfinch
bullfrog bullhead bullheaded bullhide bullion bullish bullnecked
bullock bullring bullseye bullwhack bully bullyboy bulrush bulwark bum
bumble bumblebee bummer bump bumper bumptious bun bunch bundle bundy
bungalow bungle bunion bunk bunkmate bunny bunt bunting buoy buoyant
burbank burden burdensome burdock bureau bureaucracy bureaucrat
bureaucratic buret burette burg burgeon burgess burgher burglar
burglarproof burglary burial buried burl burlap burlesque burley burly
burn burnish burnout burnt burp burro burrow bursitis burst bursty
bury bus busboy buses bush bushel bushmaster bushwhack bushy business
businessman businessmen buss bust bustard buster bustle busy but
butadiene butane butch butcher butchery butene buteo butler butt butte
butter butterball buttercup butterfat butterfingers butterfly
buttermilk butternut buttery buttock button buttonhole buttonweed
buttress butyl butyrate butyric buxom buy buyer buzz buzzer buzzing
buzzsaw buzzword buzzy by bye bygone bylaw byline bypass bypath
byproduct byroad bystander byte byway byword c cab cabal cabana
cabaret cabbage cabdriver caber cabin cabinet cabinetmake cabinetry
cable cacao cachalot cache cackle cacophonist cacophony cacti cactus
cadaver cadaverous caddis caddy cadence cadent cadenza cadet cadmium
cadre caerphilly cafe cafeteria cage cagey cahoot cahoots caiman cairn
cajole cake calamitous calamity calamus calcareous calcify calcine
calcite calcium calculable calculate calculi calculus caldera calendar
calendrical calends calf calfskin caliber calibrate calibre calico
californium caliper caliph caliphate calisthenic call calla caller
calligraph calligraphy calliope callous callus calm caloric calorie
calorimeter calumniate calumny calve calvinism calypso cam camaraderie
camber cambric came camel camelback camellia camelopard cameo camera
cameraman cameramen camilla camouflage camp campaign campanile
campfire campground camphorated campion campsite campus can canal
canary cancel cancellate cancelled cancelling cancer cancerous candela
candelabra candid candidacy candidate candle candlelight candlelit
candlemas candlestick candlewick candy cane canine canister canker
cankerworm canna cannabis cannel cannery cannibal cannibalize
cannister cannon cannonball cannot canny canoe canon canonic canonize
canopy canst cant cantaloupe canteen canter canterelle canticle
cantilever cantle canto canton cantonment cantor canvas canvasback
canvass canyon cap capable capacious capacitance capacitate capacitive
capacitor capacity cape capella caper capillarity capillary capita
capital capitol capitulate capo caprice capricious capsize capstan
capstone capsule captain captaincy caption captious captivate captive
captor capture capybara car carabao caramel caravan caraway carbide
carbine carbohydrate carbon carbonaceous carbonate carbonated
carbonation carbonic carbonium carbonyl carborundum carboxy carboxylic
carboy carbuncle carburetor carcass carcinogen carcinogenic carcinoma
card cardamom cardboard cardiac cardinal cardiod cardioid cardiology
cardiovascular care careen career carefree careful caress caret
caretaker careworn carfare cargo cargoes caribou caricature caries
carload carmine carnage carnal carnation carne carney carnival carob
carol carouse carp carpal carpenter carpentry carpet carport carpus
carrageen carrel carriage carrion carrot carry carryover cart carte
cartel cartilage cartilaginous cartographer cartographic cartography
carton cartoon cartridge cartwheel carve carven caryatid casbah
cascade cascara case casebook casein casework cash cashew cashier
cashmere casino cask casket casserole cassette cassock cast castanet
castanets castellated caster casteth castigate castle castor casual
casualty cat catabolic cataclysm cataclysmic catalogue catalpa
catalysis catalyst catalytic catapult cataract catastrophe
catastrophic catatonia catatonic catawba catbird catcall catch catchup
catchword catchy catechism categoric categorical category catenate
cater caterpillar catfish catharsis cathedra cathedral catheter
cathode cathodic catholic cation cationic catkin catlike catnip catsup
cattail cattle cattleman cattlemen caucus caught cauldron cauliflower
caulk causal causate causation cause caustic caution cautionary
cautious cavalcade cavalier cavalry cave caveat caveman cavemen cavern
cavernous caviar cavil cavilling cavitate cavity cavort caw cayenne
cease cedar cede cedilla ceiling celandine celebrant celebrate
celebrity celerity celery celesta celestial celibacy cell cellar
cellophane cellular celluloid cellulose celsius cement cemetery censor
censorial censorious censure census cent centaur centenary centennial
center centerline centerpiece centigrade centimeter centipede central
centrex centric centrifugal centrifugate centrifuge centrist centroid
centum century ceramic ceramium cereal cerebellum cerebral cerebrate
ceremonial ceremonious ceremony cereus cerise cerium certain certainty
certificate certified certify certiorari certitude cerulean cervical
cervix cesium cessation cession cetera cf chablis chafe chaff chagrin
chain chair chairlady chairman chairmen chairperson chairwoman
chairwomen chaise chalcedony chalcocite chalet chalice chalk
chalkboard chalkline chalky challenge chamber chamberlain chambermaid
chameleon chamfer chamois chamomile champ champagne champion chance
chancel chancellor chancery chancy chandelier chandler change
changeable changeling changeover channel chanson chant chantey chantry
chaos chaotic chap chaparral chapel chaperon chaperone chaplain
chaplaincy chapter char character characteristic charcoal chard charge
chargeable chariot charisma charismatic charitable charity charm chart
charter chartreuse chartroom charybdis chase chasm chassis chaste
chastise chastity chat chateau chateaux chattel chatty chauffeur
chauvinism chaw cheap cheat cheater check checkbook checker
checkerberry checkerboard checklist checkmate checkout checkpoint
checksum checksummed checksumming checkup cheek cheekbone cheeky cheer
cheerful cheerlead cheerleader cheery cheese cheesecake cheesecloth
cheeseparing cheesy cheetah chef chelate chemical chemise chemisorb
chemisorption chemist chemistry chemotherapy chenille cherish cherry
chert cherub cherubim chess chest chestnut chevalier chevron chevy
chew chi chianti chic chicanery chick chickadee chicken chickenfeed
chickenhearted chickweed chicory chide chief chiefdom chieftain
chiffon chigger chignon chilblain child childbear childbearing
childbirth childhood childish childlike children chili chill chilly
chime chimera chimeric chimerical chimney chimpanzee chin china chinch
chinchilla chine chink chinquapin chip chipboard chipmunk chiromancy
chiropractor chirp chisel chit chiton chivalrous chivalry chive
chlorate chlordane chloride chlorinate chlorine chloroform chlorophyll
chloroplast chloroplatinate chock chocolate choice choir choirmaster
choke chokeberry cholera choleric cholesterol cholinesterase chomp
choose choosy chop choppy choral chorale chord chordal chordata
chordate chore choreograph choreography chorine chortle chorus chose
chosen chow chowder christen christmas chromate chromatic chromatin
chromatogram chromatograph chromatography chrome chromic chromium
chromosome chromosphere chronic chronicle chronograph chronography
chronology chrysalis chrysanthemum chrysolite chub chubby chuck
chuckle chuckwalla chuff chug chugging chum chummy chump chunk chunky
church churchgo churchgoer churchgoing churchman churchmen churchwoman
churchwomen churchyard churn chute chutney cicada cider cigar
cigarette cilia ciliate cinch cinder cinema cinematic cinnabar
cinnamon cinquefoil cipher circa circle circlet circuit circuitous
circuitry circulant circular circulate circulatory circumcircle
circumcise circumcision circumference circumferential circumflex
circumlocution circumpolar circumscribe circumscription circumspect
circumsphere circumstance circumstantial circumvent circumvention
circus cirrhosis cirrus cistern cit citadel citation cite citizen
citizenry citrate citric citron citrus city cityscape citywide civet
civic civies civil civilian civilize civvies clad cladophora claim
claimant clairvoyant clam clamber clammy clamor clamorous clamp
clamshell clan clandestine clang clanger clank clannish clap clapboard
claret clarify clarinet clarity clarts clash clasp class classic
classification classificatory classify classmate classroom classy
clatter clattery clause claustrophobia claustrophobic claw clay clean
cleanliness cleanse cleanup clear clearance clearheaded cleat cleavage
cleave cleft clematis clement clench clergy clergyman clergymen cleric
clerical clerk clever cliche click client clientele cliff cliffhang
climactic climate climatic climatology climax climb clime clinch cling
clinging clinic clinician clink clinker clip clipboard clique clitoris
cloak cloakroom clobber clock clockwatcher clockwise clockwork clod
cloddish clog clogging cloister clomp clone clonic close closefisted
closet closeup closure clot cloth clothbound clothe clothesbrush
clotheshorse clothesline clothesman clothesmen clothier cloture cloud
cloudburst cloudy clout clove cloven clover clown cloy club clubhouse
clubroom cluck clue clump clumsy clung cluster clutch clutter coach
coachman coachmen coachwork coadjutor coagulable coagulate coal
coalesce coalescent coalition coarse coarsen coast coastal coastline
coat coattail coauthor coax coaxial cobalt cobber cobble cobblestone
cobra cobweb coca cocaine coccidiosis cochineal cochlea cock cockatoo
cockcrow cockeye cockeyed cockle cocklebur cockleshell cockpit
cockroach cocksure cocktail cocky coco cocoa coconut cocoon cod coda
coddle code codebreak codeposit codetermine codeword codfish codicil
codify codling codomain codon codpiece coed coeditor coeducation
coefficient coequal coerce coercible coercion coercive coexist
coexistent coextensive cofactor coffee coffeecup coffeepot coffer
coffin cog cogent cogitate cognac cognate cognition cognitive
cognizable cognizant cohere coherent cohesion cohesive cohomology
cohort cohosh coiffure coil coin coinage coincide coincident
coincidental coitus coke col cola colander colatitude cold coleus
colic colicky coliform coliseum colitis collaborate collage collagen
collapse collapsible collar collarbone collard collate collateral
colleague collect collectible collective collectivism collector
college collegial collegian collegiate collet collide collie collier
collimate collinear collision collocation colloidal colloquia
colloquial colloquium colloquy collude collusion collywobbles colon
colonel colonial colonist colonize colonnade colony color colorate
coloratura colorimeter colossal colossi colossus colt colter coltish
coltsfoot columbine column columnar colza coma comatose comb combat
combatant combatted combinate combination combinator combinatorial
combinatoric combine combustible combustion come comeback comedian
comedy comely comet cometary cometh comfort comic comity comma command
commandant commandeer commando commemorate commence commend
commendation commendatory commensurable commensurate comment
commentary commentator commerce commercial commingle commiserate
commissariat commissary commission commit committable committal
committed committee committeeman committeemen committeewoman
committeewomen committing commodious commodity commodore common
commonality commoner commonplace commonweal commonwealth commotion
communal commune communicable communicant communicate communion
communique communism commutate commute compact compacter compactify
companion companionway company comparative comparator compare
comparison compartment compass compassion compassionate compatible
compatriot compel compellable compelled compelling compendia
compendium compensable compensate compensatory compete competent
competition competitive competitor compilation compile complacent
complain complainant complaint complaisant compleat complement
complementarity complementary complementation complete completion
complex complexion compliant complicate complicity compliment
complimentary compline comply component componentry comport compose
composite composition compositor compost composure compote compound
comprehend comprehensible comprehension comprehensive compress
compressible compression compressive compressor comprise compromise
comptroller compulsion compulsive compulsory compunction computation
compute comrade coms con concatenate concave conceal concede conceit
conceive concentrate concentric concept conception conceptual concern
concert concerti concertina concertmaster concerto concession
concessionaire conch concierge conciliate conciliatory concise
concision conclave conclude conclusion conclusive concoct concocter
concomitant concord concordant concourse concrete concretion concubine
concur concurred concurrent concurring concussion condemn condemnate
condemnatory condensate condense condensible condescend condescension
condiment condition condolence condominium condone conduce conducive
conduct conductance conductor conduit cone coneflower coney
confabulate confect confectionery confederacy confederate confer
conferee conference conferrable conferred conferring confess
confession confessor confidant confidante confide confident
confidential configuration configure confine confirm confirmation
confirmatory confiscable confiscate confiscatory conflagrate
conflagration conflict confluent confocal conform conformal
conformance conformation confound confraternity confrere confront
confrontation confuse confusion confute congeal congener congenial
congenital congest congestion congestive conglomerate congrats
congratulate congratulatory congregate congress congressional
congressman congressmen congresswoman congresswomen congruent
congruity conic conifer coniferous conjectural conjecture conjoin
conjoint conjugacy conjugal conjugate conjunct conjunction
conjunctivitis conjuncture conjure conker conn connect connectionism
connector connivance connive connoisseur connotation connotative
connote connubial conquer conqueror conquest conquistador consanguine
consanguineous consanguinity conscience conscientious conscionable
conscious conscript conscription consecrate consecutive consensus
consent consequent consequential conservancy conservation conservatism
conservative conservator conservatory conserve consider considerable
considerate consign consignee consignor consist consistent consolation
console consolidate consols consonant consonantal consort consortium
conspectus conspicuous conspiracy conspirator conspiratorial conspire
constancy constant constellate consternate constipate constituent
constitute constitution constitutive constrain constraint constrict
constrictor construct constructible constructive constructor construe
consul consular consulate consult consultant consultation consultative
consume consumer consummate consumption consumptive contact contagion
contagious contain contaminant contaminate contemplate contemporaneous
contemporary contempt contemptible contemptuous contend contender
content contention contentious contest contestant context contextual
contiguity contiguous continent continental contingent continua
continual continuant continuation continue continued continuity
continuo continuous continuum contort contour contraband contrabass
contraception contraceptive contract contractor contractual contradict
contradictory contradistinct contradistinction contradistinguish
contralateral contralto contraption contrariety contrariwise contrary
contrast contravariant contravene contravention contretemps contribute
contribution contributor contributory contrite contrition contrivance
contrive control controllable controlled controller controlling
controversial controversy controvertible contumacy contumely contusion
conundrum convalesce convalescent convect convene convenient convent
convention converge convergent conversant conversation converse
conversion convert convertible convex convey conveyance conveyor
convict convince convivial convocate convocation convoke convolute
convoluted convolution convolve convolvulus convoy convulse convulsion
convulsive cony coo cook cookbook cookery cookie cooky cool coolant
coolheaded coon coop cooper cooperate coordinate coot cop cope copious
coplanar copolymer copper copperas copperhead coppery copra coprinus
coproduct copter copy copybook copyright copywriter coquette coquina
cor coral coralberry coralline corbel cord cordage cordial cordite
cordon corduroy core coriander cork corker corkscrew cormorant corn
cornbread cornea corner cornerstone cornet cornfield cornflakes
cornflower cornish cornmeal cornstarch cornucopia corny corollary
corona coronary coronate coroner coronet coroutine corpora corporal
corporate corporeal corps corpse corpsman corpsmen corpulent corpus
corpuscular corral corralled correct corrector correlate correspond
correspondent corridor corrigenda corrigendum corrigible corroborate
corroboree corrode corrodible corrosion corrosive corrugate corrupt
corruptible corruption corsage corset cortege cortex cortical corundum
coruscate corvette cos cosec coset cosh cosine cosmetic cosmic
cosmology cosmopolitan cosmos cosponsor cost costive costume cosy cot
cotangent cotillion cotman cotoneaster cotta cottage cotton
cottonmouth cottonseed cottonwood cottony cotty cotyledon couch cougar
cough could coulomb council councilman councilmen councilwoman
councilwomen counsel counselor count countdown countenance counteract
counterargument counterattack counterbalance counterclockwise
counterexample counterfeit counterflow counterintuitive counterman
countermen counterpart counterpoint counterpoise counterproductive
counterproposal countersink countersunk countervail countrified
countrify country countryman countrymen countryside countrywide county
countywide coup coupe couple coupon courage courageous courier course
courser court courteous courtesan courtesy courthouse courtier
courtroom courtyard couscous cousin couturier covalent covariant
covariate covary cove coven covenant cover coverage coverall coverlet
covert covet covetous cow coward cowardice cowbell cowbird cowboy
cower cowgirl cowhand cowherd cowhide cowl cowlick cowman cowmen
coworker cowpea cowpoke cowpony cowpox cowpunch cowry cowshed cowslip
cox coxcomb coy coyote coypu cozen cozy cpu crab crabapple crabmeat
crack crackbrained crackle crackpot cradle craft craftsman craftsmen
craftspeople craftsperson crafty crag craggy cram cramp cranberry
crane cranelike crania cranium crank crankcase crankshaft cranky
cranny crap crappie crash crass crate crater cravat crave craven craw
crawl crawlspace crayfish crayon craze crazy creak creaky cream
creamery creamy crease create creating creature creche credent
credential credentials credenza credible credit creditor credo
credulous creed creedal creek creekside creep creepy cremate crematory
crenelated crenellated creosote crepe crept crescendo crescent cress
crest crestfallen cretin cretinous crevice crew crewcut crewel crewman
crewmen crib cricket cried crime criminal crimp crimson cringe crinkle
cripes cripple crises crisis crisp criss crisscross criteria criterion
critic critique critter croak crochet crock crockery crocodile
crocodilian crocus croft crone crony crook croon crop croquet cross
crossarm crossbar crossbenches crossbill crossbones crossbow crossbred
crossbreed crosscut crosshatch crosslink crossover crossply crosspoint
crossroad crosstalk crosswalk crossway crosswise crossword crosswort
crotch crotchety crouch croupier crow crowbait crowberry crowd
crowfoot crown croydon crucial crucible crucifix crucifixion crucify
crud cruddy crude cruel cruelty cruise crumb crumble crummy crump
crumple crunch crupper crusade crush crust crusty crutch crux cry
cryogenic cryostat crypt cryptanalysis cryptanalyst cryptanalytic
cryptanalyze cryptic cryptogram cryptographer cryptography cryptology
crystal crystalline crystallite crystallographer crystallography csnet
cub cubbyhole cube cubic cubism cuckoo cucumber cud cuddle cuddly
cudgel cue cuff cufflink cuisine culinary cull culminate culpa
culpable culprit cult cultivable cultivate cultural culture culvert
cumbersome cumin cumulate cumulonimbus cumulus cunnilingus cunning cup
cupboard cupful cupidity cupric cuprous cur curate curative curator
curb curbside curd curdle cure curfew curia curie curio curiosity
curious curium curl curlew curlicue curly currant current curricula
curricular curriculum curry curse cursive cursor cursory curt curtail
curtain curtsey curvaceous curvature curve curvilinear cushion cusp
custodial custodian custody custom customary customer customhouse cut
cutaneous cutback cutesy cutlass cutler cutlet cutoff cutout cutover
cutset cutthroat cuttlebone cuttlefish cutworm cyanate cyanic cyanide
cybernetic cybernetics cycad cycle cyclic cyclist cyclone cyclopean
cyclorama cyclotomic cyclotron cylinder cylindric cynic cypress cyst
cysteine cystitis cytochemistry cytology cytolysis cytoplasm cytosine
czar czarina d dab dabble dachshund dactyl dactylic dad daddy daffodil
daffy dagger dahlia dainty dairy dairyman dairymen dais daisy dale
dally dam damage damask damn damnation damocles damp dampen damsel
dance dandelion dandified dandy dang danger dangerous dangle dank
dapper dapple dappled dare daredevil dark darken darkle darling darn
dart dash dashboard dastard data database date dateline dater dative
datum daub daughter daunt dauphin dauphine davenport davit dawn day
daybed daybreak daydream daylight daytime daze dazzle deacon deaconess
deactivate dead deaden deadhead deadline deadlock deadwood deaf deafen
deal deallocate dealt dean dear dearie dearth death deathbed deathward
debacle debar debarring debase debate debater debauch debauchery
debenture debilitate debility debit debonair debrief debris debt
debtor debug debugged debugger debugging debunk debut debutante decade
decadence decadent decaffeinate decal decant decathlon decay decease
decedent deceit deceitful deceive decelerate decennial decent
deception deceptive decertify decibel decide deciduous decile decimal
decimate decipher decision decisional decisionmake decisive deck
declaim declamation declamatory declaration declarative declarator
declaratory declare declassify declination decline declivity decode
decolletage decollimate decolonize decommission decompile decomposable
decompose decomposition decompress decompression decontrol
decontrolled decontrolling deconvolution deconvolve decor decorate
decorous decorticate decorum decouple decoy decrease decree decreeing
decrement decry decrypt decryption dedicate deduce deducible deduct
deductible deductive deed deem deemphasize deep deepen deer deerskin
deerstalker deface default defeat defecate defect defector defence
defend defendant defensible defensive defer deferent deferrable
deferral deferred deferring defiant deficient deficit define definite
definition definitive deflate deflater deflect deflector defocus
deforest deforestation deform deformation defraud defray defrock
defrost deft defunct defuse defy degas degassing degeneracy degenerate
degradation degrade degrease degree degum degumming dehumidify
dehydrate deify deign deism deity deja deject dejected delay
delectable delectate delegable delegate delete deleterious deletion
deliberate delicacy delicate delicatessen delicious delicti delight
delightful delimit delimitation delineament delineate delinquent
deliquesce deliquescent delirious delirium deliver deliverance
delivery dell delouse delphine delphinium delta deltoid delude deluge
delusion delusive deluxe delve demagnify demagogue demand demarcate
demark demean demeanor demented dementia demerit demigod demijohn
demiscible demise demit demitted demitting demo democracy democrat
democratic demodulate demography demolish demolition demon demoniac
demonic demonstrable demonstrate demote demotic demountable
demultiplex demur demure demurred demurrer demurring demystify den
denature dendrite dendritic deniable denial denigrate denizen
denominate denominator denotation denotative denote denouement
denounce dense densitometer dent dental dentistry denture denudation
denude denumerable denunciate denunciation deny deodorant
deoxyribonucleic deoxyribose depart department departure depend
dependency dependent depict deplete depletion deplore deploy deport
deportation deportee depose deposit depositary deposition depositor
depository depot deprave deprecate deprecatory depreciable depreciate
depredate depress depressant depressible depression depressive
depressor deprivation deprive depth deputation depute deputy derail
derange derate derby dereference deregulate deregulatory derelict
deride derision derisive derivate derive dermatitis derogate
derogatory derrick derriere dervish descant descend descendant
descendent descent describe description descriptive descriptor
desecrate desecrater desegregate desert deserve deservedly desicate
desiderata desideratum design designate designedly desire desirous
desist desk desolate desolater desorption despair desperado desperate
despicable despise despite despoil despond despondent despot despotic
dessert dessicate destabilize destinate destine destined destiny
destitute destroy destruct destructor desuetude desultory detach
detail detain detect detective detector detent detente detention deter
detergent deteriorate determinant determinate determination determine
determinism deterred deterrent deterring detest detestation detonable
detonate detour detoxify detract detractor detriment detritus deuce
deus deuterate deuterium deuteron devastate develop deviant deviate
device devil devilish devilment devious devise devisee devoid
devolution devolve devote devotee devotion devour devout dew dewar
dewdrop dewy dexter dexterity dextrose dextrous dey dharma diabase
diabetes diabetic diabolic diachronic diacritic diacritical diadem
diaeresis diagnosable diagnose diagnoses diagnosis diagnostic
diagnostician diagonal diagram diagrammatic dial dialect dialectic
dialogue dialup dialysis diamagnetic diamagnetism diameter
diametrically diamond diaper diaphanous diaphragm diary diathermy
diathesis diatom diatomaceous diatomic diatonic diatribe dibble dice
dichloride dichondra dichotomize dichotomous dichotomy dick dickcissel
dicker dickey dicotyledon dicta dictate dictator dictatorial diction
dictionary dictum did didactic diddle die diehard dieldrin dielectric
diem dieresis diesel diet dietary dietetic diethylstilbestrol
dietician diety diffeomorphic diffeomorphism differ different
differentiable differential differentiate difficult difficulty
diffident diffract diffractometer diffuse diffusible diffusion
diffusive difluoride dig digest digestible digestion digestive digging
digit digital digitalis digitate digitize dignify dignitary dignity
digram digress digression dihedral dilapidate dilapidated dilatation
dilate dilatory dilemma dilettante diligent dill dillydally
dilogarithm diluent dilute dilution dim dimension dimethyl diminish
diminution diminutive dimity dimple din dine ding dinghy dingo dingy
dinner dinnertime dinnerware dinosaur dint diocesan diocese diode
diopter diorama diorite dioxide dip diphtheria diphthong diploid
diploidy diploma diplomacy diplomat diplomatic dipole dire direct
director directorate directorial directory directrices directrix dirge
dirt dirty disaccharide disaffected disambiguate disastrous disburse
disc discern discernible disciple disciplinarian disciplinary
discipline disco discoid discomfit discontinuity discordant discover
discovery discreet discrepancy discrepant discrete discretion
discretionary discriminable discriminant discriminate discriminatory
discus discuss discussant discussion disdain disdainful disembodied
disembowel disgruntle disgruntled disgustful dish dishes dishevel
dishevelled dishwasher dishwater disinclined disinterested disjunct
disk dismal dismissal disparage disparate disparity dispel dispelled
dispelling dispensable dispensary dispensate dispense dispersal
disperse dispersible dispersion dispersive disposable disposal
disputant dispute disquietude disquisition disrupt disruption
disruptive dissemble disseminate dissension dissertation dissident
dissipate dissociable dissociate dissolution dissonant dissuade
distaff distal distant distillate distillery distinct distinction
distinguish distort distortion distraught distribution distributive
distributor district disturb disturbance disulfide disunity disyllable
ditch dither ditto ditty diurnal diva divalent divan dive diverge
divergent diverse diversify diversion diversionary divert divest
divestiture divide dividend divination divine divisible division
divisional divisive divisor divorce divorcee divulge dixieland dizzy
do doberman dobson docile dock docket dockside dockyard doctor
doctoral doctorate doctrinaire doctrinal doctrine document documentary
documentation dodecahedra dodecahedral dodecahedron dodge dodgems dodo
doe doer doff dog dogbane dogberry dogfish dogging doggone doghouse
dogleg dogma dogmatic dogmatism dogtooth dogtrot dogwood doily doings
dolce doldrum doldrums dole doleful doll dollar dollop dolly dolomite
dolomitic dolor dolphin dolt doltish domain dome domestic domesticate
domicile dominant dominate domineer dominion domino don donate donkey
donnybrook donor doodle doom doomsday door doorbell doorkeep
doorkeeper doorknob doorman doormen doorstep doorway dopant dope doric
dormant dormitory dosage dose dosimeter dossier dot dote double
doubleheader doublet doubleton doubloon doubt doubtful douce dough
doughnut dour douse dove dovekie dovetail dowager dowel dowitcher down
downbeat downcast downdraft downfall downgrade downhearted downhill
downplay downpour downright downriver downside downslope downspout
downstairs downstate downstream downtown downtrend downtrodden
downturn downward downwind dowry doze dozen drab draft draftee
draftsman draftsmen draftsperson drafty drag dragging draggled dragnet
dragon dragonfly dragonhead dragoon drain drainage drake dram drama
dramatic dramatist dramaturgy drank drape drapery drastic draw
drawback drawbridge drawl drawn drawstring dread dreadful dreadnought
dream dreamboat dreamlike dreamt dreamy dreary dredge dreg dregs
drench dress dressmake dressy drew drib dribble dribs dried drier
drift drill drink drip drippy drive driven driveway drizzle drizzly
droll dromedary drone drool droop droopy drop drophead droplet dropout
drosophila dross drought drove drown drowse drowsy drub drudge
drudgery drug drugging drugstore druid drum drumhead drumlin drunk
drunkard drunken dry dryad du dual dualism dub dubious dubitable ducat
duchess duck duckboards duckling duckweed duct ductile ductwork dud
due duel duet duff duffel duffer dug dugout duke dukedom dulcet dull
dully dulse duly dumb dumbbell dummy dump dumpling dumpy dun dunce
dung dungeon dunk duopolist duopoly dupe duplex duplicable duplicate
duplicity durable durance duration duress during dusk dusky dust
dustbin dusty dutchess dutiable dutiful duty dwarf dwarves dwell dwelt
dwindle dyad dyadic dye dyeing dyer dyeworks dynamic dynamism dynamite
dynamo dynast dynastic dynasty dyne dysentery dyspeptic dysplasia
dysprosium dystrophy e each eager eagle ear eardrum earl early earmark
earn earnest earphone earring earsplitting earth earthen earthenware
earthling earthmen earthmove earthmover earthmoving earthquake
earthshaking earthworm earthy earwig ease easel east eastbound easter
easterly eastern easternmost eastward easy easygoing eat eaten eater
eave eaves eavesdrop eavesdropped eavesdropper eavesdropping ebb ebony
ebullient eccentric ecclesiastic echelon echidna echinoderm echo
echoes eclat eclectic eclipse ecliptic eclogue ecology econometric
economic economist economy ecosystem ecstasy ecstatic ectoderm ectopic
ecumenic ecumenical ecumenist eddy edelweiss edematous edge edgeways
edgewise edging edgy edible edict edification edifice edify edit
edition editor editorial educable educate eel eelgrass eerie eerily
efface effaceable effect effectual effectuate effeminate efferent
effete efficacious efficacy efficient effloresce efflorescent effluent
effluvia effluvium effort effusion effusive eft egalitarian egg
egghead eggplant eggshell egis ego egocentric egotism egotist
egregious egress egret eh eider eidetic eigenfunction eigenspace
eigenstate eigenvalue eigenvector eight eighteen eighteenth eightfold
eighth eightieth eighty einsteinium either ejaculate eject ejector eke
el elaborate elan elapse elastic elastomer elate elbow elder eldest
elect elector electoral electorate electress electret electric
electrician electrify electro electrocardiogram electrocardiograph
electrode electroencephalogram electroencephalograph
electroencephalography electrolysis electrolyte electrolytic
electromagnet electron electronic electrophoresis electrophorus
elegant elegiac elegy element elementary elephant elephantiasis
elephantine elevate elevator eleven elevenses eleventh elfin elicit
elide eligible eliminate elision elite elitism elk ell ellipse
ellipsis ellipsoid ellipsoidal ellipsometer elliptic elm elongate
elope eloquent else elsewhere eluate elucidate elude elusive elute
elution elves elysian em emaciate emanate emancipate emasculate embalm
embank embarcadero embargo embargoes embark embarrass embassy embattle
embattled embed embeddable embedded embedder embedding embellish ember
embezzle emblazon emblem emblematic embodiment embody embolden
embolism embosomed emboss embouchure embower embowered embrace
embraceable embrittle embroider embroidery embroil embryo embryology
embryonic emcee emendable emerald emerge emergency emergent emeriti
emeritus emigrant emigrate eminent eminently emirate emissary emission
emissivity emit emittance emitted emitter emitting emma emolument
emotion emotional empathy emperor emphases emphasis emphatic emphysema
emphysematous empire empiric empirical emplace employ employed
employee employer employing emporium empower empress empty empurpled
emulate emulsify emulsion en enable enact enamel enamored enamoured
encapsulate encephalitis enchantress enclave encomia encomium encore
encroach encryption encumber encumbrance encyclical encyclopedic end
endanger endemic endgame endive endoderm endogamous endogamy
endogenous endomorphism endorse endosperm endothelial endothermic
endow endpoint endurance endure endways enemy energetic energy
enervate enfant enforceable enforcible engage engine engineer enhance
enigma enigmatic enjoinder enlargeable enliven enmity enol enormity
enormous enough enquire enquiry enrich enrollee ensanguined ensconce
ensemble enstatite entendre enter enteritis enterprise entertain
enthalpy enthrall enthusiasm enthusiast enthusiastic entice entire
entirety entity entomology entourage entrails entranceway entrant
entrepreneur entrepreneurial entropy entry enumerable enumerate
enunciable enunciate envelop enviable envious environed environs envoy
envy enzymatic enzyme enzymology eohippus eosine epaulet ephemeral
ephemerides ephemeris epic epicure epicycle epicyclic epidemic
epidemiology epidermic epidermis epigenetic epiglottis epigram
epigrammatic epigraph epileptic epilogue epimorphism epiphyseal
epiphysis episcopal episcopate episode episodic epistemology epistle
epistolatory epitaph epitaxial epitaxy epithelial epithelium epithet
epitome epoch epochal epoxy epsilon equable equal equanimity equate
equator equatorial equestrian equidistant equilateral equilibrate
equilibria equilibrium equine equinoctial equinox equip equipoise
equipotent equipped equipping equitable equitation equity equivalent
equivocal equivocate era eradicable eradicate eradicator erasable
erase erasure erbium ere erect erg ergative ergodic ergonomics erode
erodible erosible erosion erosive erotic erotica err errancy errand
errant errantry errata erratic erratum erroneous error ersatz erudite
erudition erupt eruption erysipelas escadrille escalate escalator
escapade escape escapee escapement escapism escheat eschew escort
escritoire escrow escutcheon esophagi esophagus esoteric especial
espionage esplanade espousal espouse esprit esquire essay essence
essential establish estate esteem ester estimable estimate estop
estoppal estrange estuarine estuary et eta etc etch eternal eternity
ethane ethanol ether ethereal ethic ethnic ethnography ethnology
ethology ethos ethyl ethylene etiology etiquette etude etymology
eucalyptus eucre eugenic eukaryote eulogy euphemism euphemist
euphorbia euphoria euphoric euphuism eureka europium eutectic
euthanasia evacuate evade evaluable evaluate evanescent evangel
evangelic evaporate evasion evasive eve even evenhanded evensong event
eventful eventide eventual eventuate ever evergreen everlasting every
everybody everyday everyman everyone everything everywhere evict
evident evidential evil evildoer evince evocable evocate evocation
evoke evolution evolutionary evolve evzone ewe ewer ex exacerbate
exact exacter exaggerate exalt exaltation exam examination examine
example exasperate exasperater excavate exceed exceedingly excel
excelled excellency excellent excelling excelsior except exception
exceptional excerpt excess excesses excessive exchange exchangeable
exchequer excisable excise excision excitation excitatory excite
exciton exclaim exclamation exclamatory exclude exclusion exclusionary
exclusive excommunicate excoriate excrescent excrete excretion
excretory excruciate excruciating exculpate exculpatory excursion
excursus excusable excuse execrable execrate execute execution
executive executor executrix exegesis exegete exemplar exemplary
exemplify exempt exemption exercisable exercise exert exhale exhaust
exhaustible exhaustion exhaustive exhibit exhibition exhibitionism
exhibitor exhilarate exhort exhortation exhumation exhume exigent
exile exist existent existential existentialism exit exodus exogamous
exogamy exogenous exonerate exorbitant exorcise exorcism exorcist
exoskeleton exosphere exothermic exotic exotica expand expanse
expansible expansion expansive expatiate expect expectant expectation
expectorant expectorate expedient expedite expedition expeditious
expel expellable expelled expelling expend expendable expenditure
expense expensive experience experiential experiment experimentation
expert expertise expiable expiate expiration expire explain
explanation explanatory expletive explicable explicate explicit
explode exploit exploitation exploration exploratory explore explosion
explosive exponent exponential exponentiate export exportation expose
exposit exposition expositor expository exposure expound express
expressible expression expressive expressway expropriate expulsion
expunge expurgate exquisite extant extemporaneous extempore extend
extendible extensible extension extensive extensor extent extenuate
exterior exteriorize exterminate external extinct extinguish extirpate
extol extolled extoller extolling extort extra extracellular extract
extractor extracurricular extraditable extradite extradition
extralegal extralinguistic extramarital extramural extraneous
extraordinary extrapolate extraterrestrial extravagant extravaganza
extrema extremal extreme extremely extremis extremism extremity
extremum extricable extricate extrinsic extroversion extrovert extrude
extrusion extrusive exuberant exudate exudation exude exult exultant
exultation eye eyeball eyebright eyebrow eyeful eyeglass eyeglasses
eyelash eyelet eyelid eyepiece eyesight eyesore eyewitness f fable
fabric fabricate fabulous facade face faceplate facet facetious facial
facile facilitate facility facsimile fact faction factious facto
factor factorial factory factual facultative faculty fad fade fadeout
faeces faery fag fail failsafe failsoft failure fain faint fair
fairgoer fairway fairy faith faithful fake falcon falconry fall
fallacious fallacy fallen fallible falloff fallout fallow false
falsehood falsies falsify falter fame familial familiar familiarly
familism family famine famish famous famously fan fanatic fanciful
fancy fanfare fanfold fang fangled fanout fantasia fantasist fantastic
fantasy fantod far farad farce farcical fare farewell farfetched
farina farm farmhouse farmland faro farsighted farther farthest
farthing fascicle fasciculate fascinate fascism fascist fashion fast
fasten fastidious fat fatal fatalism fate fateful father fathom
fatigue fatten fatty fatuity fatuous faucet fault faultfinding faulty
faun fauna favoritism favouritism fawn fay fax faze fealty fear
fearful fearsome feasible feast feat feather featherbed featherbedding
featherbrain featherbrained feathertop featherweight feathery feature
febrile feces fecund fed federal federate fee feeble feebleminded feed
feedback feel feet feign feint feldspar felicitous felicity feline
fell fellow felon felonious felony felsite felt female feminine
feminism feminist femur fence fencepost fend fender fennel fenugreek
ferment fermentation fermion fermium fern fernery ferocious ferocity
ferret ferric ferris ferrite ferroelectric ferromagnet ferromagnetic
ferromagnetism ferrous ferruginous ferrule ferry fertile fervent
fescue fest festival festive fetal fetch fete fetid fetish fetter
fettle fetus feud feudal feudatory fever feverish few fiance fiancee
fiasco fiat fib fiber fiberboard fibration fibrin fibrosis fibrositis
fibrous fiche fickle fiction fictitious fictive fiddle fiddlestick
fiddlesticks fide fidelity fidget fiducial fiduciary fief fiefdom
field fieldstone fieldwork fiend fiendish fierce fiery fiesta fife
fifteen fifteenth fifth fiftieth fifty fig figaro fight figment
figural figurate figurative figure figurine filament filamentary
filbert filch file filet filial filibuster filigree fill filled filler
fillet fillip filly film filmdom filmmake filmstrip filmy filter filth
filthy filtrate fin finable final finale finance financial financier
finch find fine finery finesse finessed finessing finger fingernail
fingerprint fingertip finial finicky finis finish finitary finite fink
finny fir fire firearm fireboat firebreak firebug firecracker firefly
firehouse firelight fireman firemen fireplace firepower fireproof
fireside firewalking firewall firewood firework firm firmware first
firstfruits firsthand fiscal fish fisherman fishermen fishery
fishmonger fishpond fishy fissile fission fissure fist fisticuff
fisticuffs fit fitful fitment five fivefold fix fixate fixedly fixture
fizzle fjord flabbergast flabby flack flag flagellate flageolet
flagging flagpole flagrant flagstone flail flair flak flake flaky flam
flamboyant flame flamingo flammable flange flank flannel flap flapper
flare flash flashback flashlight flashy flask flat flatbed flathead
flatiron flatland flatly flatten flatter flattery flatulent flatus
flatware flatworm flaunt flautist flaw flax flaxen flaxseed flea
fleabane fleawort fleck fled fledge fledged fledgling flee fleece
fleeing fleet flemish flesh fleshy fletch flew flex flexible flexural
flexure flick flicker flier flight flimsy flinch fling flint flintlock
flinty flip flipflop flippant flipper flirt flirtation flirtatious
flit float floc flocculate flock floe flog flogging flood floodgate
floodlight floodlit floor floorboard flop floppy flora floral florican
florid florin florist flotation flotilla flounce flounder flour
flourish floury flout flow flowchart flower flowerbed flowerpot
flowery flown flu flub fluctuate flue fluency fluent fluff fluffy
fluid fluke flung flunk fluoresce fluorescein fluorescent fluoridate
fluoride fluorine fluorite fluorocarbon fluorspar flurry flush fluster
flute flutter fluvial flux fly flycatcher flyer flyway foal foam
foamflower foamy fob focal foci focus focussed fodder foe foetus fog
fogging foggy fogy foible foil foist fold foldout foliage foliate
folio folk folklore folksong folksy follicle follicular follow
followeth folly foment fond fondle fondly font food foodstuff fool
foolhardy foolish foolproof foot footage football footbridge footer
footfall foothill footlights footman footmen footnote footpad footpath
footprint footstep footstool footwear footwork fop foppish for forage
foray forbade forbear forbearance forbid forbidden forbidding forbore
forborne force forceful forceps forcible ford fore foredoomed
foregoing foreign forensic forest forestry forever forfeit forfeiture
forfend forgave forge forgery forget forgetful forgettable forgetting
forgive forgiven forgo forgot forgotten fork forklift forlorn form
formal formaldehyde formant format formation formative formatted
formatting former formic formidable formula formulae formulaic
formulate forsake forsaken forsook forswear fort forte forth forthcome
forthcoming forthright forthwith fortieth fortify fortin fortiori
fortitude fortnight fortran fortress fortuitous fortunate fortune
forty forum forward forwent fossil fossiliferous foster fosterite
fought foul foulmouth found foundation foundling foundry fount
fountain fountainhead four foureyes fourfold foursome foursquare
fourteen fourteenth fourth fovea fowl fox foxglove foxhole foxhound
foxtail foxy foyer fracas fraction fractionate fractious fracture
fragile fragment fragmentary fragmentation fragrant frail frailty
frambesia frame framework franc franca franchise francium franco
frangipani frank frankfurter franklin frantic fraternal fraternity
fraud fraudulent fraught fray frayed frazzle freak freakish freckle
free freeboot freed freedmen freedom freehand freehold freeing freeman
freemen freer freest freestanding freestone freethink freeway
freewheel freeze freight frenetic frenzy freon frequent fresco
frescoes fresh freshen fresher freshman freshmen freshwater fret
friable friar fricative friction frictional fried friend frieze
frigate fright frighten frightful frigid frill frilly fringe frisky
fritillary fritter frivolity frivolous frizzle fro frock frog frolic
from front frontage frontal frontier frontiersman frontiersmen frost
frostbite frostbitten frosty froth frothy frown frowzy froze frozen
fructify fructose frugal fruit fruitful fruition fruity frustrate
frustrater frustum fry fudge fuel fugal fugitive fugue fulcrum fulfill
full fullback fuller fully fulminate fulness fulsome fum fumble fume
fumigant fumigate fun function functionary functor functorial fund
fundamental fundamentalism fundraise funeral funereal fungal fungi
fungible fungicide fungoid fungus funk funnel funny fur furbish
furious furl furlong furlough furnace furnish furniture furrier furrow
furry further furtherance furthermore furthermost furthest furtive
fury furze fuse fuselage fusible fusiform fusillade fusion fuss fussy
fusty futile future futurism fuzz fuzzy g gab gabardine gabble gabbro
gable gad gadfly gadget gadgetry gadolinium gadwall gaff gaffe gaffer
gag gagging gaggle gagwriter gaiety gaillardia gain gainful gait
gaiter gal gala galactic galactose galaxy gale galena galenite gall
gallant gallantry gallberry gallery galley gallic gallinule gallium
gallivant gallon gallonage gallop gallows gallstone gallus galvanic
galvanism galvanometer gam gambit gamble gambol game gamecock gamesman
gamin gamma gamut gander gang ganger gangland gangling ganglion
gangplank gangster gangway gannet gantlet gantry gap gape gar garage
garb garbage garble garden gardenia gargantuan gargle garish garland
garlic garner garnet garrison garrulity garrulous garter gas gaseous
gases gash gasify gasket gaslight gasohol gasoline gasp gassy
gastritis gastroenteritis gastrointestinal gastronome gastronomy
gasworks gate gatekeep gateway gather gator gauche gaucherie gaudy
gauge gaugeable gauleiter gaunt gauntlet gaur gauss gauze gave gavel
gavotte gawk gawky gay gaze gazelle gazette gazetteer gear gecko
gedanken gee geese geisha gel gelable gelatin gelatine gelatinous geld
gem geminate gemlike gemstone gender gene genealogy genera general
generate generic generous genesis genetic genial genie genii genital
genitive genius genotype genre gent genteel gentian gentile gentility
gentle gentleman gentlemen gentry genuine genus geocentric geochemical
geochemistry geochronology geodesic geodesy geodetic geoduck
geographer geography geology geometer geometrician geophysical
geophysics geopolitic geopolitics geranium gerbil geriatric germ
germane germanic germanium germicidal germicide germinal germinate
gerontology gerund gerundial gerundive gestalt gesticulate gesture get
getaway geyser ghastly gherkin ghetto ghost ghostlike ghostly ghoul
ghoulish giant giantess gibberish gibbet gibbon gibbous gibby gibe
giblet giblets giddap giddy gift gig gigabit gigabyte gigacycle
gigahertz gigaherz gigantic gigavolt gigawatt gigging giggle gila
gilbert gild gill gilly gilt gimbal gimmick gimmickry gimpy gin ginger
gingerly gingham gingivitis gingko ginkgo ginmill ginseng giraffe gird
girder girdle girl girlie girlish girly girth gist give giveaway given
giveth glacial glaciate glacier glacis glad gladden gladdy glade
gladiator gladiolus glamor glamorous glamour glance gland glandular
glans glare glass glassine glassware glassworks glasswort glassy
glaucoma glaucous glaze gleam glean glee gleeful glen glib glide
glimmer glimpse glint glissade glisten glitch glitter gloaming gloat
glob global globe globular globule globulin glom glomerular gloom
gloomy glorify glorious glory gloss glossary glossed glossolalia
glossy glottal glottis glove glow glower glucose glue glued gluey
gluing glum glurity glut glutamate glutamic glutamine glutinous
glutton glyceride glycerin glycerinate glycerine glycerol glycine
glycogen glycol glyph gnarl gnarled gnash gnat gnaw gneiss gnome
gnomon gnomonic gnostic gnu go goad goal goat goatherd gob gobble
gobbledygook goblet god goddess godfather godhead godkin godlike
godmother godparent godsend godson godspeed godwit goer gog goggle
gogo gold golden goldeneye goldenrod goldenseal goldfinch goldfish
goldsmith golf golly gondola gone goner gong goniometer goober good
goodbye goods goodwill goody goof goofy googly goose gooseberry gopher
gore gorge gorgeous gorgon gorilla gorse gory gosh goshawk gosling
gospel gossamer gossip got gotten gouge gourd gourmet gout govern
governance governess governor gown grab grace graceful gracious
grackle grad gradate grade gradient gradual graduate graft graham
grail grain grainy grammar grammarian grammatic grammatical grampus
granary grand grandchild grandchildren granddaughter grandeur
grandfather grandiloquent grandiose grandma grandmother grandnephew
grandniece grandpa grandparent grandson grandstand granite granitic
granny granola grant grantee grantor granular granulate granule grape
grapefruit grapevine graph grapheme graphic graphics graphite grapple
grasp grass grassland grassy grata grate grateful grater gratify
gratis gratitude gratuitous gratuity grave gravel graven gravestone
graveyard gravid gravitate gravy gray graybeard grayish graywacke
graze grease greasy great greatcoat greater grebe greed greedy green
greenery greenfly greengrocer greenhouse greenish greensward greenware
greenwood greet gregarious gremlin grenade grew grey greyhound greylag
grid griddle gridiron grief grievance grieve grievous griffin grill
grilled grillwork grim grimace grime grin grind grindstone grip gripe
grisly grist gristmill grit gritty grizzle grizzly groan groat grocer
grocery groggy groin grommet groom groove groover grope gropingly
grosbeak gross grotesque ground groundsel groundskeep groundwork group
groupoid grout grove grovel grow growl grown grownup growth grub
grubby grudge gruesome gruff grumble grundyism grunt gryphon guanidine
guanine guano guarantee guaranteeing guarantor guaranty guard
guardhouse guardian gubernatorial guerdon guernsey guerrilla guess
guesswork guest guffaw guidance guide guidebook guideline guidelines
guidepost guiding guignol guild guilder guildhall guile guillemot
guillotine guilt guilty guinea guise guitar gules gulf gull gullet
gullible gully gulp gum gumbo gumdrop gummy gumption gumshoe gun
gunfight gunfire gunflint gunk gunky gunman gunmen gunnery gunny
gunplay gunpowder gunshot gunsling gurgle guru gush gusset gust gusto
gusty gut gutsy gutter guttural guy guzzle gym gymnasium gymnast
gymnastic gymnosperm gyp gypsite gypsum gypsy gyrate gyrfalcon gyro
gyrocompass gyroscope gyves h ha habeas haberdashery habit habitable
habitant habitat habitation habitual habituate hacienda hack hackberry
hackle hackles hackmatack hackney hackneyed hacksaw had haddock hadron
hafnium haggard haggis haggle haiku hail hailstone hailstorm hair
haircut hairdo hairpin hairspring hairy halcyon hale half halfback
halfhearted halfway halibut halide halite halitosis hall hallelujah
hallmark hallow hallucinate hallway halma halo halocarbon halogen halt
halter halvah halve ham hamburger hamlet hammer hammerhead hammock
hamper hamster hamstring hand handbag handbook handclasp handcuff
handful handgun handhold handicap handicapped handicapper handicapping
handicraft handicraftsman handicraftsmen handiwork handkerchief handle
handleable handlebar handlebars handline handmade handmaiden handout
handset handshake handsome handspike handstand handwaving handwrite
handwriting handwritten handy handyman handymen hang hangable hangar
hangman hangmen hangout hangover hank hanker hansom hap haphazard
haploid haploidy haplology happen happenstance happy harangue harass
harbinger hard hardbake hardboard hardboiled hardcopy harden hardhat
hardheaded hardly hardscrabble hardtack hardtop hardware hardwearing
hardwood hardworking hardy hare harebrained harelip harem hark harm
harmful harmonic harmonica harmonious harmony harness harp harpoon
harpsichord harquebus harrier harrow harry harsh harshen hart hartal
harvest harvestman hash hashish hasp hassle hast haste hasten hasty
hat hatch hatchet hatchway hate hateful hater hath hatred haughty haul
haulage haunch haunt hautbois have haven haver havoc haw hawk hawthorn
hay hayfield haystack hayward hazard hazardous haze hazel hazelnut
hazy he head headache headboard headdress headland headlight headline
headmaster headphone headquarter headquarters headroom headset
headsman headsmen headstand headstone headstrong headwall headwater
headway headwind heady heal health healthful healthy heap hear heard
hearken hearsay hearse heart heartbeat heartbreak hearten heartfelt
hearth heartrending heartstrings heartwarming hearty heat heater heath
heathen heathenish heave heaven heavenward heavenwards heavy
heavyhearted heavyweight hebephrenic hecatomb heck heckle hectic
hector hedge hedgehog hedonism hedonist heed heel heft hefty hegemony
heigh height heighten heir heiress held helical helicopter
heliocentric heliotrope helium helix hell hellbender hellebore
hellfire hellgrammite hellish hello helm helmet helmsman helmsmen help
helpful helpmate hem hematite hemisphere hemispheric hemlock
hemoglobin hemolytic hemorrhage hemorrhoid hemosiderin hemp hen
henbane hence henceforth henchman henchmen henequen henpeck henpecked
henry hepatica hepatitis heptane her herald herb herd herdsman here
hereabout hereabouts hereafter hereby hereditary heredity herein
hereinabove hereinafter hereinbelow hereof heresy heretic hereto
heretofore hereunder hereunto herewith heritable heritage hermeneutic
hermetic hermitian hero heroes heroic heroin heroine heroism heron
herpes herpetology herringbone herself hertz hesitant hesitate
hesitater hesperus heterocyclic heterodyne heterogamous heterogeneity
heterogeneous heterosexual heterostructure heterozygous heuristic hew
hewn hex hexachloride hexadecimal hexafluoride hexagon hexagonal
hexameter hexane hey heyday hi hiatus hibachi hibernate hibiscus hick
hickory hid hidalgo hidden hide hideaway hideous hideout hierarchal
hierarchic hierarchy hieratic hieroglyphic hifalutin high highball
highboy highest highfalutin highhanded highland highlight highness
highpitched highroad hightail highway highwayman highwaymen hijack
hijinks hike hilarious hilarity hill hillbilly hillman hillmen hillock
hillside hilltop hilly hilt hilum him himself hind hinder hindmost
hindquarters hindrance hindsight hinge hint hinterland hip hippo
hippodrome hippopotamus hippy hipster hire hireling hirsute his hiss
histamine histidine histochemic histochemistry histogram histology
historian historic historiography history histrionic hit hitch hither
hitherto hive ho hoagie hoagy hoar hoard hoarfrost hoarse hob hobble
hobby hobbyhorse hobgoblin hobo hoc hock hockey hocus hodge hodgepodge
hoe hog hogan hogging hoi hold holden holdout holdover holdup hole
holeable holiday holler hollow hollowware holly hollyhock holmium
holocaust hologram holography holster holt holy holystone homage home
homebound homebuild homebuilder homebuilding homecome homecoming
homeland homely homemade homemake homeomorph homeomorphic homeopath
homeostasis homeown homeowner homesick homestead homeward homework
homicidal homicide homily homo homogenate homogeneity homogeneous
homologous homologue homology homomorphic homomorphism homonym
homophobia homosexual homotopy homozygous homunculus hondo hone honest
honesty honey honeybee honeycomb honeydew honeymoon honeysuckle hong
honk honor honoraria honorarium honorary honoree honorific hooch hood
hoodlum hoof hoofmark hook hookup hookworm hooligan hoop hoopla
hoosegow hoot hooter hooves hop hope hopeful hopple hopscotch horde
horehound horizon horizontal hormone horn hornbeam hornblende hornet
hornmouth horntail hornwort horny horology horoscope horrendous
horrible horrid horrify horror horse horseback horsedom horseflesh
horsefly horsehair horseman horsemen horseplay horsepower horseracing
horseshoe horsetail horsewoman horsewomen horticulture hose hosiery
hospice hospitable hospital hospitality host hostage hostelry hostess
hostile hostler hot hotbed hotbox hotel hotelman hothead hothouse
hotly hotrod hotshot hough hound hour hourglass house houseboat
housebreak housebroken housefly household housekeep housekeeping
housetops housewares housewarming housewife housewives housework hove
hovel hover how howdy however howl howsoever howsomever hoy hoyden
hoydenish hub hubbub hubby hubris huck huckleberry huckster huddle hue
huff hug huge hugging huh hulk hull hum human humane humanitarian
humanities humanoid humble humerus humid humidify humidistat humidor
humiliate humility hummingbird hummock humor humorous hump humpback
humpty humus hunch hundred hundredfold hundredth hung hunger hungry
hunk hunt hurdle hurl hurley hurrah hurray hurricane hurry hurt hurtle
hurty husband husbandman husbandmen husbandry hush husky hustings
hustle hut hutch huzzah hyacinth hyaline hybrid hydra hydrangea
hydrant hydrate hydraulic hydride hydro hydrocarbon hydrochemistry
hydrochloric hydrochloride hydrodynamic hydroelectric hydrofluoric
hydrogen hydrogenate hydrology hydrolysis hydromagnet hydrometer
hydronium hydrophilic hydrophobia hydrophobic hydroponic hydrosphere
hydrostatic hydrothermal hydrous hydroxide hydroxy hydroxyl
hydroxylate hyena hygiene hygrometer hygroscopic hying hymen hymn
hymnal hyperbola hyperbolic hyperboloid hyperboloidal hypercritical
hypertensive hyphen hyphenate hypnosis hypnotic hypnotism hypoactive
hypochlorite hypochlorous hypocrisy hypocrite hypocritic hypocritical
hypocycloid hypodermic hypophyseal hypotenuse hypothalamic
hypothalamus hypotheses hypothesis hypothetic hypothetical hypothyroid
hysterectomy hysteresis hysteria hysteric hysterical hysteron i iambic
ibex ibid ibis ice iceberg icebox iceland ichneumon icicle icky icon
iconic iconoclasm iconoclast icosahedra icosahedral icosahedron icy
idea ideal ideate idempotent identical identify identity ideolect
ideologue ideology idiocy idiom idiomatic idiosyncrasy idiosyncratic
idiot idiotic idle idol idolatry idyll idyllic if iffy igloo igneous
ignite ignition ignoble ignominious ignoramus ignorance ignorant
ignore ii iii ileum iliac ill illegal illegible illegitimacy
illegitimate illicit illimitable illiteracy illiterate illogic
illogical illume illuminate illumine illusion illusionary illusive
illusory illustrate illustrious image imagen imagery imaginary
imaginate imagine imbalance imbecile imbed imbibe imbroglio imbrue
imbue imitable imitate immaculate immanent immaterial immature
immeasurable immediacy immediate immemorial immense immerse immersion
immigrant immigrate imminent immiscible immobile immobility immobilize
immoderate immodest immodesty immoral immortal immovable immune
immunization immunoelectrophoresis immutable imp impact impair impale
impalpable impart impartation impartial impassable impasse impassion
impassioned impassive impatient impeach impeccable impedance impede
impediment impel impelled impeller impelling impend impending
impenetrable imperate imperative imperceivable imperceptible imperfect
imperial imperil imperious imperishable impermeable impermissible
impersonal impersonate impertinent imperturbable impervious impetuous
impetus impiety impinge impious impish implacable implant implantation
implausible implement implementation implementer implementor implicant
implicate implicit implode implore implosion imply impolite impolitic
imponderable import importance important importation importunate
importune impose imposition impossible impost imposture impotent
impound impoverish impracticable impractical imprecate imprecise
imprecision impregnable impregnate impresario impress impressible
impression impressive imprimatur imprint imprison improbable impromptu
improper impropriety improve improvident improvisate improvisation
improvise imprudent impudent impugn impulse impulsive impunity impure
imputation impute in inability inaccessible inaccuracy inaccurate
inaction inactivate inactive inadequacy inadequate inadmissible
inadvertent inadvisable inalienable inalterable inane inanimate
inanition inappeasable inapplicable inappreciable inapproachable
inappropriate inapt inaptitude inarticulate inasmuch inattention
inattentive inaudible inaugural inaugurate inauspicious inboard inborn
inbred inbreed inbreeding incalculable incandescent incant incantation
incapable incapacitate incapacity incarcerate incarnate incaution
incautious incendiarism incendiary incense incentive inception
inceptor incessant incest incestuous inch incident incidental
incidentally incinerate incipient incise incisive incisor incite
incivility inclement inclination incline inclose include inclusion
inclusive incoherent incombustible income incommensurable
incommensurate incommunicable incommutable incomparable incompatible
incompetent incomplete incompletion incomprehensible incomprehension
incompressible incomputable inconceivable inconclusive incondensable
incongruity incongruous inconsequential inconsiderable inconsiderate
inconsistent inconsolable inconspicuous inconstant incontestable
incontrollable incontrovertible inconvenient inconvertible
incorporable incorporate incorrect incorrigible incorruptible
increasable increase increasingly incredible incredulity incredulous
increment incriminate incubate incubi incubus inculcate inculpable
incumbent incur incurable incurred incurrer incurring incursion
incurved indebted indecent indecipherable indecision indecisive
indecomposable indeed indefatigable indefensible indefinable
indefinite indelible indelicate indemnify indemnity indent indentation
indenture independent indescribable indestructible indeterminable
indeterminacy indeterminate index indicant indicate indices indict
indicter indifferent indigene indigenous indigent indigestible
indigestion indignant indignation indignity indigo indirect
indiscernible indiscoverable indiscreet indiscretion indiscriminate
indispensable indispose indisposed indisposition indisputable
indissoluble indistinct indistinguishable indium individual
individualism individuate indivisible indoctrinate indolent
indomitable indoor indorse indubitable induce inducible induct
inductance inductee inductive inductor indulge indulgent industrial
industrialism industrious industry indwell indy ineducable ineffable
ineffective ineffectual inefficacy inefficient inelastic inelegant
ineligible ineluctable inept inequality inequitable inequity
inequivalent ineradicable inert inertance inertia inertial inescapable
inestimable inevitable inexact inexcusable inexhaustible inexorable
inexpedient inexpensive inexperience inexpert inexpiable inexplainable
inexplicable inexplicit inexpressible inextinguishable inextricable
infallible infamous infamy infancy infant infantile infantry
infantryman infantrymen infarct infatuate infatuated infeasible infect
infectious infelicitous infelicity infer inference inferential
inferior infernal inferno inferred inferring infertile infest
infestation infidel infidelity infield infight infighting infiltrate
infima infimum infinite infinitesimal infinitive infinitude infinitum
infinity infirm infirmary infix inflame inflammable inflammation
inflammatory inflate inflater inflationary inflect inflexible inflict
inflicter inflow influence influent influential influenza influx info
inform informal informant information informative infra infract
infrared infrastructure infrequent infringe infuriate infuse infusible
infusion ingather ingathering ingenious ingenuity ingenuous ingest
ingestible ingestion inglorious ingoing ingot ingrained ingrate
ingratiate ingratitude ingredient ingrown inhabit inhabitant
inhabitation inhalation inhale inharmonious inhere inherent inherit
inheritance inheritor inhibit inhibition inhibitor inhibitory
inholding inhomogeneity inhomogeneous inhospitable inhuman inhumane
inimical inimitable iniquitous iniquity initial initiate inject
injudicious injunct injunction injure injurious injury injustice ink
inkling inlaid inland inlay inlet inmate inn innards innate inner
innermost innkeeper innocent innocuous innovate innuendo innumerable
inoculate inoffensive inoperable inoperative inopportune inordinate
inorganic input inputting inquest inquire inquiry inquisition
inquisitive inquisitor inroad insane insatiable inscribe inscription
inscrutable insect insecticide insecure inseminate insensible
insensitive inseparable insert inset inshore inside insidious insight
insightful insignia insignificant insincere insinuate insipid insist
insistent insofar insolent insoluble insolvable insolvent insomnia
insomniac insouciant inspect inspector inspiration inspire instability
instable install installation installment instalment instance instant
instantaneous instantiate instead instep instigate instill
instillation instinct instinctual institute institution instruct
instructor instrument instrumentation insubordinate insubstantial
insufferable insufficient insular insulate insulin insult insuperable
insupportable insuppressible insurance insure insurgent insurmountable
insurrect insurrection intact intake intangible integer integrable
integral integrand integrate integrity integument intellect
intellectual intelligent intelligentsia intelligible intemperance
intemperate intend intendant intense intensify intensive intent
intention inter interbreed intercalate intercept interception
interceptor intercity intercom interdict interest interfere
interference interferometer interim interior interject interlude
intermediary intermit intermittent intern internal internalize
internecine internescine interpolant interpolate interpolatory
interpret interpretation interpretive interregnum interrogate
interrogatory interrupt interruptible interruption intersect
intersperse interstice interstitial interval intervene intervenor
intervention interviewee intestate intestinal intestine intimacy
intimal intimate intimater intimidate into intolerable intolerant
intonate intone intoxicant intoxicate intractable intramolecular
intransigent intransitive intrepid intricacy intricate intrigue
intrinsic introduce introduction introductory introit introject
introspect introversion introvert intrude intrusion intrusive intuit
intuitable intuition intuitive inundate inure invade invalid
invalidate invaluable invariable invariant invasion invasive invective
inveigh inveigle invent invention inventive inventor inventory inverse
inversion invert invertebrate invertible invest investigate
investigatory investor inveterate inviable invidious invigorate
invincible inviolable inviolate invisible invitation invite invitee
invocate invoice invoke involuntary involute involution involutorial
involutory involve invulnerable inward iodate iodide iodinate iodine
ion ionic ionosphere ionospheric iota ipecac ipsilateral ipso irate
ire iridium iris irk irksome iron ironic ironside ironstone ironwood
irony irradiate irrational irreclaimable irreconcilable irrecoverable
irredeemable irredentism irredentist irreducible irrefutable irregular
irrelevancy irrelevant irremediable irremovable irreparable
irreplaceable irrepressible irreproachable irreproducible irresistible
irresolute irresolution irresolvable irrespective irresponsible
irretrievable irreverent irreversible irrevocable irrigate irritable
irritant irritate irruption is isentropic isinglass island isle
isochronal isochronous isocline isolate isomer isomorph isomorphic
isopleth isotherm isothermal isotope isotopic isotropic isotropy
issuance issuant issue isthmus it italic itch item itemize iterate
itinerant itinerary itself iv ivory ivy ix j jab jabber jack jackal
jackanapes jackass jackboot jackdaw jacket jackknife jackpot jade jag
jagging jaguar jail jake jalopy jam jamboree jangle janissary janitor
janitorial jar jargon jasper jaundice jaunty javelin jaw jawbone
jawbreak jay jazz jazzy jealous jealousy jean jeans jeep jejune
jejunum jelly jellyfish jenny jeopard jeopardy jerk jerky jerry jersey
jess jest jester jet jetliner jettison jewel jewelry jibe jiffy jig
jigger jigging jiggle jigsaw jilt jimjams jimmy jingle jingoism jinks
jinx jitter jitterbug jitterbugger jitterbugging jitters jittery jive
job jobber jobholder jock jockey jockstrap jocose jocular jocund
jodhpurs joey jog jogging joggle join joint joke jollity jolly jolt
jonquil joss jostle jot joule jounce journal journalese journey
journeyman journeymen joust jovial jowl jowly joy joyful joyous
joyride joystick jubilant jubilate jubilee judaism judge judicable
judicatory judicature judicial judiciary judicious judo jug jugate
jugging juggle juice juicy juju jujube juke julep july jumble jumbo
jump jumper jumpy junco junction junctor juncture jungle junior
juniper junk junkerdom junketeer junky junta jure juridic juridical
jurisdiction jurisprudent jurisprudential juror jury just justice
justiciable justify jut jute juvenile juxtapose juxtaposition k kaiser
kale kaleidescope kaleidoscope kalends kalmia kamikaze kangaroo kaolin
kaolinite kapok kappa karate karma karyatid kava kayo kazoo keddah
keel keelson keen keep keeshond keg kelly kelp ken kennel keno kept
kerchief kern kernel kerosene kerry kerygma kestrel ketch ketchup
ketone ketosis kettle key keyboard keyed keyhole keynote keypunch keys
keystone keyword khaki khan kibbutzim kibitz kick kickback kickoff kid
kiddie kidnap kidnapped kidnapping kidney kill killdeer killjoy kilo
kilohm kimono kin kind kindergarten kindle kindly kindred kinematic
kinesic kinesthesis kinetic king kingbird kingdom kingfisher kinglet
kingpin kink kinky kiosk kipper kirk kiss kissing kit kitchen
kitchenette kite kitten kittenish kittle kitty kiva kivu kiwi klaxon
kleenex klystron knack knacker knapsack knead knee kneecap kneel knell
knelt knew knick knickerbockers knickers knife knifelike knight knit
knives knob knobbly knobby knock knockdown knockout knoll knot knotty
know knoweth knowhow knowledge knowledgeable known knuckle knuckleball
knurl koala kodak kohlrabi koinonia kola kolkhoz kombu kosher kraft
kraut kris krypton kudo kudos kudzu kulak kumis kumquat kurus
kwashiorkor l la lab label labia labial labile lability labor
laboratory laborious labour labradorite labyrinth lac lace lacerate
lacewing lack lackadaisic lackadaisical lackey lackluster laconic
lacquer lacrosse lactate lactose lacuna lacunae lacustrine lacy lad
ladder laden lading ladle lady ladyfern ladylike lag lager lagging
lagoon laid lain lair laissez laity lake lakeside lam lamb lambda
lambert lame lamellar lament lamentable lamentation laminar laminate
lamp lampblack lamplight lampoon lamprey lance land landau landfill
landhold landlocked landlord landmark landowner landscape landslide
lane language languid languish lank lanky lantern lanthanide lanthanum
lap lapel lapelled lapidary lappet lapse lapwing larceny larch lard
larder large largemouth largesse lariat lark larkspur larva larvae
larval laryngeal larynges laryngitis larynx lascar lascivious lase
lash lass lasso last latch late latent later latera lateral laterite
latex lath lathe lather latitude latitudinal latitudinary latter
lattice latus laud laudanum laudatory laugh laughingstock laughter
launch launder laundry laura laureate laurel lava lavabo lavatory
lavender lavish law lawbreak lawbreaker lawbreaking lawful lawgive
lawgiver lawgiving lawmake lawman lawmen lawn lawrencium lawsuit
lawyer lax laxative lay layette layman laymen layoff layout layup laze
lazy lazybones lea leach leachate lead leaden leadeth leadsman
leadsmen leaf leaflet leafy league leak leakage leaky lean leap
leapfrog leapt learn lease leasehold leash least leastways leather
leatherback leatherneck leatherwork leathery leave leaven lebensraum
lecher lechery lectern lectionary lecture led ledge ledger lee leech
leek leer leery leeward leeway left leftmost leftover leftovers
leftward lefty leg legacy legal legate legatee legato legend legendary
leger legerdemain legging leggy leghorn legible legion legislate
legislature legitimacy legitimate legume leguminous leisure leisurely
leitmotif leitmotiv lemma lemming lemon lemonade lend length lengthen
lengthways lengthwise lengthy lenient lenity lens lent lenticular
lentil leonine leopard leper lepidolite leprosy lesbian lesion less
lessee lessen lesson lessor lest let lethal lethargic lethargy letter
letterhead letterman lettermen lettuce leucine leukemia levee level
leveler lever leverage levitate levity levulose levy lew lewd lexical
lexicography lexicon lexis liable liaison liar libation libel libelous
liberal liberate libertarian libertine liberty libidinous libido
librarian library librate librettist libretto lice licence licensable
license licensee licensor licentious lichen lick licorice lid lie lien
lieu lieutenant life lifeblood lifeboat lifeguard lifelike lifelong
lifespan lifestyle lifetime lift ligament ligand ligature light
lighten lightface lighthearted lighthouse lightning lightproof
lightweight lignite lignum like likely liken likeness likewise lilac
lilt lily lim limb limber limbic limbo lime limelight limestone limit
limitate limitation limousine limp limpet limpid limpkin linctus
linden line lineage lineal linear linebacker lineman linemen linen
lineprinter lineup linger lingerie lingo lingua lingual linguist
liniment link linkage linoleum linseed lint lion lioness lionize lip
lipid lipread lipstick liquefaction liquefy liqueur liquid liquidate
liquidity liquidus liquor lisle lisp list listen lit litany liter
literacy literal literary literate literature lithe lithic lithium
lithograph lithography lithology lithosphere lithospheric litigant
litigate litigious litmus litotes litter litterbug little littleneck
littoral liturgic liturgy live liven liver liverwort livery livestock
liveth livid livre lizard lo load loaf loam loamy loan loath loathe
loathsome loaves lob lobar lobby loblolly lobo lobotomy lobscouse
lobster lobular lobule local locale locate loci lock locknut lockout
locksmith lockstep lockup locomote locomotion locomotive locomotor
locomotory locoweed locus locust locution locutor lodestone lodge
lodgepole loess loft lofty log logarithm logarithmic loge loggerhead
loggerheads logging logic logician logistic logjam logo logrolling
loin loincloth loiter loll lollipop lolly lone lonely lonesome long
longevity longhaired longhand longheaded longhorn longish longitude
longitudinal longleg longsighted longstanding longsuffering longtime
longue longways longwearing longwinded look lookout lookup loom loon
loop loophole loose looseleaf loosen loosestrife loot lop lope lopseed
lopsided loquacious loquacity loquat lord lordosis lore losable lose
loss lossy lost lot lotion lottery lotus loud loudspeak loudspeaker
loudspeaking lounge louse lousewort lousy louver love lovebird
lovelorn lovely lovemaking low lowboy lowbred lowdown lower lowland
loy loyal loyalty lozenge lubricant lubricate lubricious lubricity
lucid luck lucky lucrative lucre lucy ludicrous lug luge luger luggage
lugger lugging luke lukemia lukewarm lull lullaby lulu lumbar lumber
lumberman lumbermen lumen luminance luminary luminescent luminosity
luminous lummox lump lumpish lumpy lunacy lunar lunary lunate lunatic
lunch luncheon lunchroom lunchtime lung lunge lupine lurch lure lurid
lurk luscious lush lust luster lustful lustrous lusty lutanist lute
lutetium lux luxe luxuriant luxuriate luxurious luxury lycopodium lye
lymph lymphocyte lymphoma lynch lynx lyric lyricism lysergic lysine m
ma macabre macaque mace machination machine machinelike machinery
machismo macho macintosh mack mackerel mackintosh macrame macro
macromolecular macromolecule macrophage macroprocessor macroscopic
macrostructure mad madam madcap madden madder made madhouse madman
madmen madrigal madstone maestro magazine magenta maggot maggoty magi
magic magician magisterial magistrate magma magna magnanimity
magnanimous magnate magnesia magnesite magnesium magnet magnetic
magnetite magneto magnetron magnificent magnify magnitude magnolia
magnum magpie magus mahogany maid maiden maidenhair maidservant mail
mailbox mailman mailmen maim main mainland mainline mainspring
mainstay mainstream maintain maintenance maitre maize majestic majesty
major majority make makeshift makeup maladapt maladaptive maladjust
maladjusted maladroit malady malaise malaprop malapropism malapropos
malaria malarial malconduct malcontent maldistribute male maledict
malefactor malevolent malfeasant malformation malformed malfunction
malice malicious malign malignant mall mallard malleable mallet mallow
malnourished malnutrition malocclusion malposed malpractice malt
maltose maltreat mambo mamma mammal mammalian mammoth man mana manage
manageable managerial manatee mandamus mandarin mandate mandatory
mandible mandrake mandrel mandrill maneuver manganese mange mangel
manger mangle manhole manhood mania maniac maniacal manic manifest
manifestation manifold manikin manipulable manipulate mankind manna
mannequin manner mannerism mannerly manometer manor manpower manse
manservant mansion manslaughter mantel mantic mantis mantissa mantle
mantlepiece mantrap manual manufacture manumission manumit manumitted
manure manuscript many manzanita maoism map maple maquis mar marathon
maraud marble march marchioness margarine margin marginal marginalia
maria marigold marijuana marimba marina marinade marinate marine
marionette marital maritime marjoram mark market marketeer marketplace
marketwise marksman marksmen marlin marmalade marmot maroon marque
marquee marquess marquis marriage marriageable married marrow
marrowbone marry marsh marshal marshland marshmallow marsupial mart
marten martensite martial martin martingale martini martinmas martyr
martyrdom marvel marvelous marxism mascara masculine maser mash mask
masochism masochist mason masonry masque masquerade mass massacre
massage masseur massif massive mast master masterful mastermind
masterpiece mastery mastic mastiff mastitis mastodon mastoiditis
masturbate mat match matchbook matchmake mate mater material
materialize materiel maternal maternity math mathematic mathematician
mathematics matinal matinee matins matriarch matriarchal matrices
matriculate matrimonial matrimony matrix matroid matron matte matter
mattins mattock mattress maturate mature maudlin maul mausoleum mauve
maverick maw mawkish max maxim maxima maximal maximize maximum maxwell
may mayapple maybe mayfly mayhem mayonnaise mayor mayoral mayst maze
mazurka mccarthyism me mead meadow meadowland meadowsweet meager meal
mealtime mealy mean meander meaningful meant meantime meanwhile measle
measles measly measure meat meaty mechanic mechanism mechanist mecum
medal medallion meddle media medial median mediate medic medical
medicate medicinal medicine medico mediocre mediocrity meditate medium
medlar medley meek meet meetinghouse megabit megabyte megahertz
megalomania megalomaniac megaton megavolt megawatt megaword megohm
meiosis melamine melancholy melange melanin melanoma meld melee
meliorate meliorism mellow melodic melodious melodrama melodramatic
melody melon melt meltdown meltwater member membrane memento memo
memoir memorabilia memorable memoranda memorandum memorial memory men
menace menagerie menarche mend mendacious mendacity mendelevium
menfolk menhaden menial meningitis meniscus menopause menses
menstruate mensurable mensuration mental mentholated mention mentor
menu mephistopheles mercantile mercenary mercer mercerize merchandise
merchant merciful mercilessly mercurial mercuric mercury mercy mere
merely meretricious merganser merge meridian meridional meringue merit
meritorious merlin mermaid merriment merry merrymake merrymaking mesa
mescal mescaline mesdames mesdemoiselles meseems mesenteric mesh
mesmeric mesmerism mesoderm meson mesquite mess message messenger
messiah messieurs messrs messy met metabole metabolic metabolism
metabolite metal metallic metalliferous metallography metalloid
metallurgic metallurgist metallurgy metalwork metamorphic metamorphism
metamorphose metamorphosis metaphor metaphoric mete metempsychosis
meteor meteoric meteorite meteoritic meteorology meter methacrylate
methane methanol methinks methionine method methodic methodical
methodism methodology meths methyl methylene meticulous metier metric
metrical metro metronome metropolis metropolitan mettle mettlesome mew
mezzanine mezzo mi miasma miasmal mica mice michaelmas michigan micro
microbial microcosm microelectronics microfiche micrography microjoule
micron microorganism microscopy mid midband midday middle middleman
middlemen middleweight midge midget midland midmorn midnight midpoint
midrange midscale midsection midshipman midshipmen midships midspan
midst midstream midterm midway midweek midwife midwinter midwives mien
miff miffed mig might mighty mignon migrant migrate migratory mike
mila milch mild mildew mile mileage milestone milieu militant
militarism militarist military militate militia militiamen milk
milkweed milky mill millenarian millenia millennia millennium miller
millet millinery million millionaire millions millionth millipede
millstone milord milt mimeograph mimesis mimetic mimic mimicked
mimicking min minaret mince mincemeat mincingly mind mindful mine
minefield mineral mineralogy minestrone minesweeper mingle mini
miniature minibike minibus minicomputer minim minima minimal minimax
minimize minimum minion ministerial ministry mink minnow minor minot
minstrel minstrelsy mint minuend minuet minus minuscule minute
minuteman minutemen minutiae miracle miraculous mirage mire mirror
mirth misanthrope misanthropic misapply miscegenation miscellaneous
miscellany mischievous miscible miscreant misdeed misdoing miser
miserable misery misgiving misnomer misogynist misogyny
mispronunciation miss missal misshapen missile mission missionary
missis missive missus mist mister mistletoe mistress misty mite miter
miterwort mitigate mitochondria mitosis mitral mitre mitt mitten mix
mixture mixup mnemonic moan moat mob mobcap mobile mobility mobilize
mobster moccasin mock mockernut mockery mockingbird mockup modal mode
model modem moderate moderator modern modest modesty modicum modify
modish mods modular modulate module moduli modulo modulus modus moiety
moire moist moisten moisture molal molar molasses mold moldboard
molder mole molecular molecule molehill molest mollify mollusk
mollycoddle molt molten molybdate molybdenite molybdenum moment
momenta momentary momentous momentum mommy monad monadic monarch
monarchic monarchy monastery monastic monaural monel monetarism
monetarist monetary money moneybags moneymake moneywort mongoose monic
monies monitor monitory monk monkey monkeyflower monkish monochromatic
monochromator monocotyledon monocular monogamous monogamy monoid
monolith monologist monologue monomer monomeric monomial mononucleosis
monopoly monotheism monotonous monotreme monoxide monsieur monsoon
monster monstrosity monstrous montage monte month monument moo mood
moody moon moonlight moonlit moor moose moot mop moraine moral morale
morass moratorium morbid more morel moreover morgen morgue moribund
morn moron morose morpheme morphemic morpheus morphine morphism
morphology morphophonemic morrow morsel mort mortal mortar mortem
mortgage mortgagee mortgagor mortician mortify mortise mosaic mosque
mosquito moss mossy most mot motel motet moth mothball mother
motherhood motherland motif motion motivate motive motley motor
motorcycle mottle mottled motto mould moulder mound mount mountain
mountaineer mountainous mountainside mourn mournful mouse moustache
mousy mouth mouthful mouthpiece move movie mow mu much mucilage muck
mucosa mucus mud muddle muddlehead muddy mudguard mudsling muezzin
muff muffin muffle muffler mug mugging muggins muggy mugho mulatto
mulberry mulch mulct mule mulish mull mullah mullein mulligan
mulligatawny mullion multi multifarious multinomial multiple multiplet
multiplex multiplexor multipliable multiplicand multiplication
multiplicative multiplicity multiply multitude multitudinous mum
mumble mummy mumps munch mundane mung municipal munificent muniments
munition muon mural murder murderous muriatic murk murky murmur murre
muscle muscular musculature muse museum mush mushroom mushy music
musicale musician musicology musk muskellunge musket muskmelon muskox
muskoxen muskrat muslim muslin mussel must mustache mustachio mustang
mustard muster musty mutable mutagen mutandis mutant mutate mutation
mutatis mute mutilate mutineer mutiny mutt mutter mutton muttonchops
mutual mutuel muzzle my mycobacteria mycology myel myeline myelitis
myeloid mylar mynah myocardial myocardium myofibril myoglobin myopia
myopic myosin myriad myrrh myrtle myself mysterious mystery mystic
mystify mystique myth mythic mythology myxomatosis n nab nabla nadir
nag nagging naiad nail naive naivete naked name nameable namely
nameplate namesake nanometer nanosecond nap napkin narcissism
narcissist narcissus narcosis narcotic narrate narrow nary nasal
nascent nasturtium nasty natal nation national nationhood nationwide
native nativity natty natural naturalize nature naturism naturopath
naughty nausea nauseate nauseum nautical nautilus naval nave navel
navigable navigate navy nay ne neap near nearby nearest nearsighted
neat neater neath nebula nebulae nebular nebulous necessary
necessitate necessity neck necklace neckline necktie necromancer
necromancy necromantic necropolis necropsy necrosis necrotic nectar
nectareous nectarine nectary nee need needful needham needle
needlepoint needlework needy negate neglect neglecter negligee
negligent negligible negotiable negotiate negus neither nemesis
neoclassic neoclassical neocolonialism neoconservative neodymium
neolithic neologism neon neonatal neonate neophyte neoprene nepenthe
nephew nephritis nepotism neptunium nereid nerve nervous nest nestle
nestor net nether netherworld nettle nettlesome network neural
neuralgia neurasthenic neuritis neuroanatomic neuroanatomy
neuroanotomy neurology neuromuscular neuron neuronal neuropathology
neurophysiology neuropsychiatric neuroses neurosis neurotic neuter
neutral neutrino neutron neve never nevertheless new newborn newcomer
newel newfangled newfound newline newlywed news newsboy newscast
newsletter newsman newsmen newspaper newspaperman newspapermen
newsreel newsstand newt newton next nexus niacin nib nibble nibs nice
nicety niche nichrome nick nickel nicker nickname nicotinamide
nicotine niece niggardly nigger niggle nigh night nightcap
nightclothes nightclub nightdress nightfall nightgown nighthawk
nightingale nightmare nightmarish nightshirt nighttime nihilism
nihilist nil nilpotent nimble nimbus nine ninebark ninefold nineteen
nineteenth ninetieth ninety ninth niobium nip nipper nipple nirvana
nit niter nitpick nitrate nitric nitride nitrite nitrogen nitrogenous
nitroglycerine nitrous nitty no nob nobelium noble nobleman noblemen
noblesse nobody nocturnal nocturne nod nodal nodular nodule noise
noisemake noisy nolo nomad nomadic nomenclature nominal nominate
nominative nominee nomogram nomograph non nonagenarian nonaligned
nonce nonchalant nonconformity nondescript none nonentity nonetheless
nonogenarian nonplus nonsensic nonsensical noodle nook noon noontime
noose nor norm normal normalcy normative north northbound northeast
northeastern northerly northern northernmost northland northward
northwest northwestern nose nosebag nosebleed nostalgia nostalgic
nostril not notable notary notate notation notch note notebook
noteworthy nothing notice noticeable notify notion notocord notoriety
notorious notwithstanding noun nourish nouveau nova novel novelty
novice novitiate novo now nowaday nowadays nowhere nowise noxious
nozzle nu nuance nubile nucleant nuclear nucleate nuclei nucleic
nucleoli nucleolus nucleotide nucleus nuclide nude nudge nudism
nugatory nugget nuisance null nullify numb number numerable numeral
numerate numeration numerator numeric numerical numerology numerous
numinous numismatic numismatist nun nuptial nurse nurseling nursery
nursling nurture nut nutate nutcrack nuthatch nutmeg nutria nutrient
nutrition nutritious nutritive nutshell nuzzle nylon nymph nymphomania
nymphomaniac o oaf oak oaken oakwood oar oases oasis oat oath oatmeal
obduracy obdurate obedient obeisant obelisk obese obey obfuscate
obfuscatory obituary object objectify objective objectivity objector
objet oblate obligate obligatory oblige oblique obliterate oblivion
oblivious oblong obnoxious oboe oboist obscene obscurantism obscure
obsequies obsequious obsequy observant observation observatory observe
obsess obsession obsessive obsidian obsolescent obsolete obstacle
obstetric obstetrics obstinacy obstinate obstruct obstruent obtain
obtrude obtrusion obtrusive obverse obviate obvious ocarina occasion
occident occidental occipital occlude occlusion occlusive occult
occultate occultation occupant occupation occupy occur occurred
occurrent occurring ocean oceangoing oceanic oceanographer
oceanography oceanside ocelot octagon octagonal octahedra octahedral
octahedron octal octane octant octave octennial octet octile octillion
octogenarian octopus octoroon ocular odd oddment ode odious odium
odometer odor odorous oecumenical oersted oesophagus of off offal
offbeat offence offend offensive offer offertory offhand office
officeholder officemate officer official officialdom officiate officio
officious offload offprint offsaddle offset offsetting offshoot
offshore offspring offstage oft often oftentimes ogle ogre ogress oh
ohm ohmic ohmmeter oil oilcloth oilman oilmen oilseed oily oint
ointment okay old olden oldster oldy oleander olefin oleomargarine
olfactory oligarchic oligarchy oligoclase oligopoly olive olivine
ombudsman ombudsperson omega omelet omen omicron ominous omission omit
omitted omitting omnibus omnipotent omnipresent omniscient on once
oncology oncoming one onerous oneself onetime oneupmanship ongoing
onion onlook onlooker onlooking only onomatopoeia onomatopoeic onrush
onrushing onset onslaught onto ontogeny ontology onus onward onyx
oocyte oodles oops ooze opacity opal opalescent opaque open
openhearted opera operable operand operant operate operatic
operational operetta operon ophthalmic ophthalmology opiate opine
opinion opinionate opinionated opium opossum opponent opportune
opportunism opposable oppose opposite opposition oppress oppression
oppressive oppressor opprobrium opt optative optic optima optimal
optimism optimist optimistic optimum option optoacoustic
optoelectronic optoisolate optometrist optometry opulent opus or
oracle oracular oral orange orangeroot orangutan orate oration
oratoric oratorical oratorio oratory orb orbit orbital orchard
orchestra orchestral orchestrate orchid orchis ordain ordeal order
orderly ordinal ordinance ordinary ordinate ordination ordnance ore
oregano organ organdy organic organism organismic organize
organometallic orgasm orgiastic orgy orient oriental orifice origin
original originate oriole ornament ornamentation ornate ornately
ornery orographic orography orphan orphanage orthant orthicon
orthoclase orthodontic orthodontist orthodox orthodoxy orthogonal
orthography orthonormal orthopedic orthophosphate orthorhombic
oscillate oscillatory oscilloscope osier osmium osmosis osmotic osprey
osseous ossify ostensible ostentatious osteoarthritis osteology
osteopath osteopathic osteopathy osteoporosis ostracism ostracod
ostrich other otherwise otherworld otherworldly otiose otter ouch
ought ounce our ourselves oust out outbuilding outdated outdoor outer
outermost outgoing outgoings outlandish outlawry outlying outmoded
outpourings outrageous outskirts outstanding outstretched outwardly
ouvre ouzel ouzo ova oval ovary ovate oven ovenbird over overfly
overhang overjoyed overly overpopulated overseas oversexed overstuffed
oversubscribed overt overture overweening oviform ovum ow owe owl owly
own ox oxalate oxalic oxcart oxen oxeye oxidant oxidate oxide oxygen
oxygenate oyster ozone p pa pace pacemake pacesetting pacific pacifism
pacifist pacify pack package packet pact pad paddle paddock paddy
padlock padre paean paediatrics pagan page pageant pageantry paginate
pagoda paid pail pain painful painstaking paint paintbrush pair
pairwise pal palace palais palatable palate palazzi palazzo pale
palette palfrey palindrome palindromic palisade pall palladia
palladium pallet palliate pallid pallor palm palmate palmer palmetto
palpable palsy pampa pampas pamper pamphlet pan panacea panama pancake
pancreas pancreatic panda pandemic pandemonium pander panel pang
panhandle panic panicked panicky panicle panjandrum panoply panorama
panoramic panpipes pansy pant pantheism pantheist pantheon panther
pantomime pantomimic pantry panty pap papa papacy papal papaw paper
paperback paperbound paperweight paperwork papery papillary papoose
pappy paprika papyri papyrus par parable parabola parabolic paraboloid
paraboloidal parachute parade paradigm paradigmatic paradise paradox
paradoxic paraffin paragon paragonite paragraph parakeet
paralinguistic parallax parallel parallelepiped parallelogram
paralysis paramagnet paramagnetic paramedic parameter paramilitary
paramount paranoia paranoiac paranoid paranormal parapet paraphernalia
paraphrase parapsychology paras parasite parasitic parasol
parasympathetic paratroop paratroops paraxial parboil parcel parch
parchment pardon pardoner pare paregoric parent parentage parental
parentheses parenthesis parenthetic parenthood pariah parimutuel
parish parishioner parity park parkish parkland parkway parlance
parlay parley parliament parliamentarian parliamentary parochial
parody parole parolee parquet parrot parry parse parsimonious
parsimony parsley parsnip parson parsonage part partake
parthenogenesis partial participant participate participle particle
particular particulate partisan partition partitive partner partook
partridge party parvenu paschal pasha pass passage passageway passband
passenger passer passerby passion passionate passivate passive
passport password past paste pasteboard pastel pasteup pastiche
pastime pastor pastoral pastry pasture pasty pat patch patchwork
patchy patent patentee pater paterfamilias paternal paternity
paternoster path pathetic pathfind pathogen pathogenesis pathogenic
pathology pathos pathway patient patina patio patois patriarch
patriarchal patriarchy patrician patrimonial patrimony patriot
patriotic patristic patrol patrolled patrolling patrolman patrolmen
patron patronage patroness pattern patty paucity paunch paunchy pauper
pause pavanne pave pavilion paw pawn pawnshop pax pay paycheck payday
paymaster payoff payroll pea peace peaceable peaceful peacekeeping
peacemake peacetime peach peacock peafowl peak peaky peal peanut pear
pearl pearlite pearlstone pearly peasant peasanthood peat pebble pecan
peccary peck pecker pectoral pectoralis peculate peculiar pecuniary
pedagogic pedagogue pedagogy pedal pedant pedantic pedantry peddle
pedestal pedestrian pediatric pediatrician pediatrics pedigree
pediment pee peed peek peel peep peephole peepy peer peg pegboard
pegging pejorative pelican pellagra pellet pelt peltry pelvic pelvis
pemmican pen penal penalty penance penates pence penchant pencil pend
pendant pending pendulum penetrable penetrate penguin penicillin
peninsula penis penitent penitential penitentiary penman penmen penna
pennant penny pennyroyal pension pensive pent pentagon pentagonal
pentagram pentane pentecostal penthouse penultimate penumbra penurious
penury peony people pep pepper peppergrass peppermint pepperoni
peppery peppy peptide per perambulator perceive percent percentage
percentile percept perceptible perception perceptive perceptual perch
perchance perchlorate percolate percussion percussive perdition
peregrine peremptory perennial perfect perfecter perfectible
perfidious perfidy perforate perforce perform performance perfume
perfumery perfunctory perfuse perfusion perhaps peridotite perihelion
peril perilous perimeter period periodic periodical peripatetic
peripheral periphery periphrasis periphrastic periscope perish
perisher peritectic peritonitis periwinkle perjure perjury perk perky
permalloy permanent permeable permeate permissible permission
permissive permit permitted permitting permutation permute pernicious
peroxide perpendicular perpetrate perpetual perpetuate perpetuity
perplex perquisite persecute persecution persecutory perseverance
perseverant persevere persiflage persimmon persist persistent person
persona personable personage personal personify personnel perspective
perspicacious perspicuity perspicuous perspiration perspire persuade
persuasion persuasive pert pertain pertinacious pertinent perturb
perturbate perturbation perusal peruse pervade pervasion pervasive
perverse perversion pervert pessimal pessimism pessimist pessimum pest
peste pesticide pestilent pestilential pestle pet petal petit petite
petition petrel petri petrifaction petrify petrochemical petroglyph
petrol petroleum petrology petticoat pettifogging petty petulant
petunia pew pewee pewter pfennig phage phagocyte phalanger phalanx
phalarope phallus phantasy phantom pharaoh pharmaceutic pharmaceutical
pharmacist pharmacology pharmacopoeia pharmacy pharyngitis phase
pheasant phenol phenolic phenomena phenomenal phenomenology phenomenon
phenotype phenyl phenylalanine phi phial philanthrope philanthropic
philanthropy philately philharmonic philodendron philology philosoph
philosopher philosophic philosophy phlebitis phloem phlox phobic
phoebe phoenix phon phone phoneme phonemic phonetic phonic phonograph
phonology phonon phony phosgene phosphate phosphide phosphine phosphor
phosphoresce phosphorescent phosphoric phosphorus phosphorylate photo
photogenic photography photolysis photolytic photometry photon
photosynthesis phrase phrasemake phraseology phthalate phthisis
phycomycetes phyla phylogeny physic physical physician physics
physiochemical physiognomy physiology physiotherapist physiotherapy
physique phytoplankton pi pianissimo pianist piano piazza pica
picayune piccolo pick pickaxe pickerel picket pickle pickoff pickup
picky picnic picnicked picnicker picnicking picofarad picojoule
picosecond pictorial picture picturesque piddle pidgin pie piece
piecemeal piecewise pier pierce pietism piety piezoelectric pig pigeon
pigeonberry pigeonfoot pigeonhole pigging piggish piggy piggyback
pigheaded pigment pigmentation pigpen pigroot pigskin pigsticking
pigtail pike pile pilewort pilfer pilferage pilgrim pilgrimage pill
pillage pillar pillion pillory pillow pilot pimp pimple pin pinafore
pinball pinch pincushion pine pineal pineapple ping pinhead pinhole
pinion pink pinkie pinkish pinnacle pinnate pinochle pinpoint pinscher
pint pintable pintail pinto pinwheel pinxter pion pioneer pious pip
pipal pipe pipeline pipette pipsissewa piquant pique piracy pirate
pirogue pirouette piss pistachio pistol pistole piston pit pitch
pitchblende pitchfork pitchstone piteous pitfall pith pithy pitiable
pitiful pitilessly pitman pituitary pity pivot pivotal pixel pixilated
pixy pizza pizzeria pizzicato placate placater place placeable placebo
placeholder placenta placental placid plagiarism plagiarist
plagioclase plague plagued plaguey plaid plain plaintiff plaintive
plan planar planeload planet planetaria planetarium planetary
planetesimal planetoid plank plankton planoconcave planoconvex plant
plantain plantation plaque plasm plasma plasmon plaster plastic
plastisol plastron plat plate plateau platelet platen platform
platinum platitude platitudinous platonic platoon platypus plausible
play playa playback playboy playful playground playhouse playmate
playoff playroom plaything playtime playwright playwriting plaza plea
plead pleasant please pleasure pleat plebeian plebian pledge plenary
plenipotentiary plenitude plentiful plenty plenum plethora pleura
pleural plexus pliable pliancy pliant pliers plight plod plop plot
plover plowman plowshare pluck plucky plug plugboard pluggable
plugging plum plumage plumb plumbago plumbate plumber plume plummet
plump plunder plunge plunk pluperfect plural pluralism pluribus plus
plush plushy pluton plutonium ply plyscore plywood pneumatic
pneumococcus pneumoconiosis pneumonia poach pocket pocketbook
pocketful pocus pod podge podia podium poem poesy poet poetic poetry
pogo pogrom poi poignant poinsettia point pointillism pointwise poise
poison poisonous poke poker pokerface pol polar polarimeter
polariscope polariton polarogram polarograph polarography polaron pole
polecat polemic police policeman policemen policy polio poliomyelitis
polis polish polite politic politician politicking politico politics
polity polka polkadot poll pollen pollinate pollock polloi pollster
pollutant pollute pollution polly polo polonaise polonium polopony
poly polyanthus polyglot polygon polygonal polygraph polygynous
polyhedra polyhedral polyhedron polymer polymerase polymeric polymorph
polymorphic polynomial polyphony polyploidy polypropylene polypus
polysaccharide polytechnic polytheism polytope polytypy pomade
pomegranate pomp pompadour pompano pompey pompon pomposity pompous
poncho pond ponder ponderous pong pont pontiff pontific pontifical
pontificate pony pooch poodle pooh pool poop poor pop popcorn popish
poplar poplin popper poppy populace popular populate populism populist
populous porcelain porch porcine porcupine pore pork pornographer
pornography porosity porous porphyry porpoise porridge port portable
portage portal portcullis portend portent portentous porter
porterhouse portfolio portico portion portland portly portmanteau
portrait portraiture portray portrayal portulaca posable pose poseur
posey posh posit position positive positivism positron posse posseman
possemen possess possession possessive possessor possible possum post
postage postal postcard postcondition postdoctoral posterior
posteriori posterity postfix postgraduate posthumous postlude postman
postmark postmaster postmen postmortem postmultiply postoperative
postorder postpaid postpone postposition postprocess postprocessor
postscript postulate posture postwar posy pot potable potash potassium
potation potato potatoes potbelly potboil potent potentate potential
potentiometer pothole potion potlatch potpourri pottery pouch poultice
poultry pounce pound pour pout poverty pow powder powderpuff powdery
power powerful powerhouse ppm practicable practical practically
practice practise practitioner praecox pragmatic pragmatism pragmatist
prairie praise praiseworthy pram prance prank praseodymium praxis pray
prayer prayerful preach preachy preamble precarious precaution
precautionary precede precedence precedent precept preceptor precess
precession precinct preciosity precious precipice precipitable
precipitate precipitous precis precise precision preclude precocious
precocity preconceived precursor predatory predecessor predeterminer
predicament predicate predict predictor predilect predispose
predisposition predominant predominantly predominate preeminent
preeminently preempt preemption preemptive preemptor preen prefab
prefabricate preface prefatory prefect prefecture prefer preference
preferential preferred preferring prefix pregnant prehistoric
prejudice prejudicial preliminary prelude premature premeditate
premier premiere premise premium premonition premonitory preoccupy
prep preparation preparative preparatory prepare preponderant
preponderate preposition prepossessed prepossessing preposterous
prerequisite prerogative presage presbytery prescribe prescript
prescription prescriptive presence present presentation presentational
preservation preserve preside president presidential press pressure
prestidigitate prestige prestigious presto prestressed presume
presumed presuming presumption presumptive presumptuous presuppose
presupposition pretend pretense pretension pretentious pretext pretty
prevail prevalent prevent prevention preventive preview previous prexy
prey price prick prickle pride priest prig priggish prim prima primacy
primal primary primate prime primeval primitive primitivism primordial
primp primrose primus prince princess principal principality principle
print printmake printout prior priori priority priory prism prismatic
prison prissy pristine privacy private privateer privet privilege
privy prize prizewinning pro probabilist probable probate probation
probe probity problem problematic proboscis procaine procedural
procedure proceed proceedings proceeds process procession processor
proclaim proclamation proclivity procrastinate procreate procrustean
proctor procure prod prodigal prodigious prodigy produce producible
product productivity profane profess profession professional professor
professorial proffer proficient profile profit profiteer profligacy
profligate profound profundity profuse profusion progenitor progeny
prognosis prognosticate programmable programmed programmer programming
progress progression progressive prohibit prohibition prohibitive
prohibitory project projectile projector prokaryote prolate
prolegomena proletariat proliferate prolific proline prolix prologue
prolong prolongate prolusion prom promenade promethium prominent
promiscuity promiscuous promise promote promotion prompt promptitude
promulgate prone prong pronoun pronounce pronounceable pronto
pronunciation proof proofread prop propaganda propagandist propagate
propane propel propellant propelled propeller propelling propensity
proper property prophecy prophesy prophet prophetic prophylactic
prophylaxis propinquity propionate propitiate propitious proponent
proportion proportionate propos proposal propose proposition propound
proprietary proprietor propriety proprioception proprioceptive
propulsion propyl propylene prorate prorogue prosaic proscenium
proscribe proscription prose prosecute prosecution prosecutor prosodic
prosody prosopopoeia prospect prospector prospectus prosper prosperous
prostate prostheses prosthesis prosthetic prostitute prostitution
prostrate protactinium protagonist protean protease protect protector
protectorate protege protein proteolysis proteolytic protest
protestant protestation prothonotary protocol proton protoplasm
protoplasmic prototype prototypic protozoan protract protractor
protrude protrusion protrusive protuberant proud prove proven
provenance proverb proverbial provide providence provident
providential province provincial provision provisional proviso
provocateur provocation provocative provoke provost prow prowess prowl
proximal proximate proximity proxy prudence prudent prudential prune
prurient pruritus pry psalm psalter psaltery pseudo psi psittacosis
psoriasis psych psyche psychiatric psychiatrist psychiatry psychic
psycho psychoacoustic psychoanalysis psychoanalyst psychoanalytic
psychobiology psychokinesis psychology psychometry psychopath
psychopathic psychophysic psychophysiology psychopomp psychoses
psychosis psychosomatic psychotherapeutic psychotherapist
psychotherapy psychotic psyllium ptarmigan pterodactyl pub puberty
pubescent pubic public publication publish puck pucker puckish pudding
puddingstone puddle puddly pueblo puerile puff puffball puffed puffer
puffery puffin puffy pug pugilism pugnacious pugnacity puissant puke
pull pullback pulley pullover pulmonary pulp pulpit pulsar pulsate
pulse pulverable puma pumice pummel pump pumpkin pumpkinseed pun punch
punctual punctuate puncture pundit punditry pungent punic punish
punitive punk punky punster punt puny pup pupal pupate pupil puppet
puppeteer puppy puppyish purchasable purchase pure pureblooded
purebred purgation purgative purgatory purge purify purine puritanic
purl purler purlieus purloin purple purport purpose purposeful
purposive purr purse purser purslane pursuance pursuant pursue pursuer
pursuit purvey purveyor purview pus push pushbutton pushout pushpin
pussy pussycat put putative putt putter putty puzzle pygmy pyknotic
pyracanth pyramid pyramidal pyre pyridine pyrimidine pyrite pyrites
pyroelectric pyrolyse pyrolysis pyrometer pyrophosphate pyrotechnic
pyroxene pyroxenite pyrrhic python q qua quack quackery quad
quadrangle quadrangular quadrant quadratic quadrature quadrennial
quadric quadriceps quadrilateral quadrille quadrillion quadripartite
quadrivium quadruped quadruple quadrupole quaff quagmire quahog quail
quaint quake quaker qualified qualify qualitative quality qualm
quandary quanta quantify quantile quantitative quantity quantum
quarantine quark quarrel quarrelsome quarry quarryman quarrymen quart
quarter quarterback quartermaster quartet quartic quartile quartz
quartzite quasar quash quasi quasicontinuous quasiorder quasiparticle
quasiperiodic quasistationary quaternary quatrain quaver quay queasy
queen queer quell quench querulous query quest question questionable
questionnaire quetzal queue quibble quick quicken quickie quicklime
quicksand quicksilver quickstep quid quiescent quiet quietus quill
quillwort quilt quince quinine quint quintessence quintessential
quintet quintic quintillion quintus quip quipping quirk quirky quirt
quisling quit quitting quiver quixotic quiz quizzes quizzical quo quod
quonset quorum quota quotation quote quotient r rabat rabbet rabbi
rabbinical rabbit rabble rabid rabies raccoon race racetrack raceway
racial rack racket racketeer rackety racy radar radial radian radiant
radiate radical radices radii radio radioactive radioastronomy
radiocarbon radiochemical radiochemistry radiogram radiography
radiology radiometer radiophysics radiosonde radiotelegraph
radiotelephone radiotherapy radish radium radius radix radon raffia
raffish raffle raft rafter rag rage ragging ragout ragweed raid rail
railbird railhead raillery railroad railway rain rainbow raincoat
raindrop rainfall rainstorm rainy raise raisin raj rajah rake rakish
rally ram ramble ramify ramp rampage rampant rampart ramrod ran ranch
rancho rancid rancorous random randy rang range rangeland ranger rangy
rank ranker rankle ransack ransom rant rap rapacious rapacity rape
rapid rapids rapier rapport rapprochement rapt rapture rare rarefy
rasa rascal rash rasher rasp raspberry raster rat rata rate ratepayer
rater rather ratify ratio ratiocinate ration rational rationale
rattail ratter rattle rattlebrained rattlesnake ratty raucous ravage
rave ravel raven ravenous raver ravine ravish raw rawboned rawhide ray
raze razor razorback razzle re reach reactant reactionary reactor read
readily readout ready real realisable realize really realm realtor
realty ream reap rear reason reave reb rebel rebelled rebelling
rebellion rebellious rebuke rebus rebut rebuttal rebutted rebutting
recalcitrant recappable receipt receive recent receptacle reception
receptive receptor recess recession recessional recessive recherche
recipe recipient reciprocal reciprocate reciprocity recital recitative
reck reckon reclamation recline recluse recombinant recommend
recompense reconcile recondite recondition reconnaissance record
recorder recordkeeping recovery recreation recriminate recriminatory
recruit rectangle rectangular rectifier rectify rectilinear rectitude
rector rectory recumbent recuperate recur recurred recurrent recurring
recursion recurved recusant recuse recycle red redact redactor redbird
redbud redcoat redden reddish redemption redemptive redhead redneck
redoubtable redound redpoll redshank redstart redtop reduce reducible
redundant redwing redwood reed reedbuck reedy reef reefer reek reel
reemploy reeve refection refectory refer referable referee refereeing
referenda referendum referent referential referral referred referring
refinery reflect reflectance reflector reflexive reformatory refract
refractometer refractory refrain refrigerate refuge refugee refusal
refutation refute regal regale regalia regard regatta regent regime
regimen regiment regimentation region regional register registrable
registrant registrar registration registry regress regression
regressive regret regretful regrettable regretted regretting regular
regulate regulatory regurgitate rehabilitate rehearsal rehearse reign
reimbursable reimburse rein reindeer reinforce reinstate reject
rejecter rejoice rejoinder rejuvenate relate relatively relativism
relaxation relayed releasable relevant reliant relic relict relief
relieve religion religiosity religious religiously relinquish
reliquary relish reluctant rely remain remainder reman remand remark
remarkable remediable remedial remedy remember remembrance reminisce
reminiscent remiss remission remit remittance remitted remitting
remnant remonstrate remorse remorseful remote remotely removal
remunerate renaissance renal rend render rendezvous rendition
renegotiable renew renewal renounce renovate renown rent rental
renunciate rep repairman repairmen reparation repartee repeal repeat
repeatedly repeater repel repelled repellent repelling repent
repentant repertoire repertory repetition repetitious repetitive
replaceable replenish replete replica replicate reply report
reportedly reportorial repository reprehensible represent
representative repression repressive reprieve reprimand reprisal
reprise reproach reptile reptilian republic republican repudiate
repugnant repulsion repulsive reputation repute request require
requisite requisition requited reredos rerouted rerouting rescind
rescue resemblant resemble resent resentful reserpine reservation
reserve reservoir reside resident residential residual residuary
residue residuum resign resignation resilient resin resinated resiny
resist resistant resistible resistive resistor resolute resolution
resolve resonant resonate resorcinol resort resourceful respect
respecter respectful respective respiration respirator respiratory
respire respite resplendent respond respondent response responsible
responsive rest restaurant restaurateur restful restitution restive
restoration restorative restrain restraint restrict restroom result
resultant resume resuming resumption resurgent resurrect resuscitate
ret retail retain retaliate retaliatory retard retardant retardation
retch retention retentive reticent reticulate reticulated reticulation
reticulum retina retinal retinue retire retiree retort retract retrain
retribution retrieval retrieve retroactive retrofit retrofitted
retrofitting retrograde retrogress retrogression retrogressive
retrorocket retrospect retrovision return rev reveal revel revelation
revelatory revelry revenge revenue rever reverberate revere reverend
reverent reverie reversal reverse reversible reversion revert
revertive revery revet review revile revisable revisal revise revision
revisionary revisionism revival revive revocable revoke revolt
revolution revolutionary revolve revolver revulsion revved revving
reward rhapsodic rhapsody rhenium rheology rheostat rhesus rhetoric
rhetorician rheum rheumatic rheumatism rhinestone rhino rhinoceros rho
rhodium rhododendron rhodolite rhodonite rhombi rhombic rhombohedral
rhombus rhubarb rhyme rhythm rhythmic rib ribald ribbon riboflavin
ribonucleic ribose ribosome rice rich rick rickets rickety rickshaw
ricochet rid riddance ridden riddle ride ridge ridgepole ridicule
ridiculous riesling riffle rifle rifleman riflemen rift rig rigging
right righteous rightful rightmost rightward rigid rigor rigorous rill
rilly rim rime rimy ring ringlet ringmaster ringside rink rinse riot
riotous rip riparian ripen ripoff ripple rise risen riser risible risk
risky rite ritual rival rivalry rive riven river riverbank riverbed
riverfront riverine riverside rivet rivulet roach road roadbed
roadblock roadhouse roadside roadster roadway roam roar roast rob
robbery robbin robe robin robot robotic robotics robust rock rockabye
rockaway rockbound rocket rocky rococo rod rode rodent rodeo roe
roebuck rogue roil roister role roll rollback rollick rollicking
romance romantic romp romper rondo rood roof rooftop rooftree rook
rookie rooky room roomful roommate roomy roost rooster root rope
rosary rose rosebud rosebush rosemary rosette roster rostrum rosy rot
rotary rotate rotenone rotogravure rotor rototill rotten rotter rotund
rotunda rouge rough roughcast roughen roughish roughneck roughshod
roulette round roundabout roundhead roundhouse roundly roundoff
roundtable roundup roundworm rouse roustabout rout route routine rove
rover row rowboat rowdy royal royalty rub rubber rubbery rubbish
rubble rubdown rubicund rubidium ruble rubric ruby ruckus rudder ruddy
rude rudiment rudimentary rue rueful ruff ruffian ruffle rufous rug
ruin ruination ruinous rule rum rumble rumen ruminant ruminate rummage
rummy rumor rump rumple rumpus run runabout runaway rundown rung runic
runneth runoff runt runty runway rupee rupture rural ruse rush rusk
russet russula rust rustic rustle rustproof rusty rut rutabaga
ruthenium ruthless rutile rutty rye s sa sabbath sabbatical sable
sabotage sabra sac saccade saccharine sachem sack sacral sacrament
sacred sacrifice sacrificial sacrilege sacrilegious sacrosanct sad
sadden saddle saddlebag sadism sadist sadomasochism safari safe
safeguard safekeeping safety saffron sag saga sagacious sagacity
sagebrush sagging sagittal sago saguaro said sail sailboat sailfish
sailor saint sainthood sake salacious salacity salad salamander salami
salaried salary sale salesgirl saleslady salesman salesmen salesperson
salient saline saliva salivary salivate sallow sally salmon
salmonberry salmonella salon saloon saloonkeep saloonkeeper salsify
salt saltbush saltwater salty salubrious salutary salutation salute
salvage salvageable salvation salve salver salvo samarium samba same
samovar sample sampler sanatoria sanatorium sanctify sanctimonious
sanction sanctity sanctuary sanctus sand sandal sandalwood sandbag
sandblast sanderling sandhill sandman sandpaper sandpile sandpiper
sandstone sandwich sandy sane sang sangaree sanguinary sanguine
sanguineous sanicle sanitarium sanitary sanitate sank sans sap sapiens
sapient sapling saponify sapphire sappy sapsucker sarcasm sarcastic
sarcoma sarcophagus sardine sardonic sari sarsaparilla sarsparilla
sash sashay sassafras sat satan satanic satellite satiable satiate
satiety satin satire satiric satisfaction satisfactory satisfy
saturable saturate saturater saturnine satyr sauce saucepan saucer
saucy sauerkraut sausage saute sauterne savage savagery savant save
savor savoy savvy saw sawbelly sawbones sawdust sawfish sawfly sawmill
sawtimber sawtooth sawyer sax saxifrage saxophone say scab scabbard
scabies scabious scabrous scads scaffold scalar scald scale scallop
scalp scam scamp scamper scan scandal scandalous scandium scant scanty
scapegoat scapula scapular scar scarce scare scarecrow scarf scarface
scarify scarlet scarper scarves scary scat scathe scathing scatter
scatterbrain scattergun scaup scavenge scenario scene scenery scenic
scent sceptic schedule schelling schema schemata schematic scheme
scherzo schism schist schizoid schizomycetes schizophrenia
schizophrenic schlieren schnapps scholar scholastic school schoolbook
schoolboy schoolgirl schoolgirlish schoolhouse schoolmarm schoolmaster
schoolmate schoolroom schoolteacher schoolwork schooner sciatica
science scientific scientist scimitar scintillate scion scissor
sclerosis sclerotic scoff scold scoop scoot scooter scope scopic scops
scorch score scoreboard scorecard scoria scorn scornful scorpion
scotch scoundrel scour scourge scout scowl scrabble scraggly scram
scramble scrap scrapbook scrape scratch scratchy scrawl scrawny scream
screamingly screech screechy screed screen screenplay screw screwball
screwbean screwdriver screwworm scribble scribe scrim scrimmage script
scription scriptural scripture scriven scroll scrooge scrotum scrounge
scrub scrubber scrumptious scruple scrupulosity scrupulous scrutable
scrutiny scuba scud scuff scuffle scull scullion sculpin sculpt
sculptor sculptural sculpture scum scurrility scurrilous scurry scurvy
scuttle scutum scythe sea seabed seaboard seacoast seafare seafaring
seafood seagoing seagull seahorse seal sealant seam seaman seamen
seamstress seamy seance seaport seaquake sear search searchlight
seashore seaside season seasonal seat seater seaward seaweed sec
secant secateurs secede secession seclude seclusion second secondary
secondhand secrecy secret secretarial secretariat secretary secrete
secretion secretive sect sectarian section sector sectoral secular
secure sedan sedate sedentary seder sedge sediment sedimentary
sedimentation sedition seditious seduce seduction seductive sedulous
see seeable seed seedbed seedling seedy seeing seek seem seemly seen
seep seepage seer seersucker seethe seethed seething segment
segmentation segregant segregate seismic seismograph seismography
seismology seize seizure seldom select selectman selectmen selector
selenate selenite selenium self selfadjoint selfish sell seller
sellout seltzer selves semantic semaphore semblance semester semi
semidetached seminal seminar seminarian seminary semitropical
semiweekly semper sen senate senatorial send senile senior senor
senorita sensate sense sensible sensitive sensor sensorimotor sensory
sensual sensuous sent sentence sentential sentient sentiment sentinel
sentry sepal separable separate separatism sepia sepsis sept septa
septate septennial septic septillion septuagenarian septum sepuchral
sepulchral seq sequel sequent sequential sequester sequestration
sequin sequitur sera seraglio serape seraphim serenade serendipitous
serendipity serene serf serfdom serge sergeant serial seriate seriatim
series serif serine serious sermon serology serpent serpentine
serrated serried serum serval servant serve service serviceable
serviceberry serviceman servicemen serviette servile servitor
servitude servo servomechanism sesame session set setback setscrew
settle setup seven sevenfold seventeen seventeenth seventh seventieth
seventy sever several severalfold severalty severance sew sewage sewer
sewerage sewn sex sextet sextillion sexton sextuple sextuplet sexual
sexy sforzando shabby shack shackle shad shadbush shade shadflower
shadow shadowy shady shaft shag shagbark shagging shaggy shah shake
shakeable shakedown shaken shako shaky shale shall shallot shallow
shalom sham shamble shame shameface shamefaced shameful shampoo
shamrock shank shanty shape shard share sharecrop shareholder shareown
shark sharp sharpen sharper sharpshoot shatter shatterproof shave
shaven shaw shawl shay she sheaf shear sheath sheathe sheave shed
sheen sheep sheepskin sheer sheet sheik shekels shelf shell
shellacking shelter shelve shenanigan shepherd sherbet sheriff sherry
shibboleth shied shield shift shifty shill shilling shim shimmy shin
shinbone shine shiner shingle shiny ship shipboard shipbuild
shipbuilding shiplap shipman shipmate shipmen shipshape shipwreck
shipyard shire shirk shirring shirt shirtmake shish shitepoke shiv
shiver shivery shoal shock shockheaded shod shoddy shoe shoehorn
shoelace shoemake shoestring shoji shone shoo shoofly shook shoot shop
shopkeep shopsoiled shopworn shore shoreline short shortage
shortcoming shortcut shorten shortfall shorthand shortish shortsighted
shortstop shot shotbush shotgun should shoulder shout shove shovel
show showboat showcase showdown shower showman showmen shown showpiece
showplace showroom showy shrank shrapnel shred shrew shrewd shrewish
shriek shrift shrike shrill shrilly shrimp shrine shrink shrinkage
shrive shrivel shroud shrove shrub shrubbery shrug shrugging shrunk
shrunken shuck shudder shuddery shuffle shuffleboard shun shunt shut
shutdown shutoff shutout shutter shuttle shuttlecock shy sial sib
sibilant sibling sibyl sic sick sickbed sicken sickish sickle
sicklewort sickly sickroom side sidearm sideband sideboard sidecar
sidelight sideline sidelong sideman sidemen sidereal siderite
sidesaddle sideshow sidesplitting sidestep sidestepping sidetrack
sidewalk sidewall sideway sideways sidewinder sidewise sidle siege
sienna sierra siesta sieve sift sigh sight sightly sightsee
sightseeing sightseer sigma sign signal signature signboard signet
significant signify signor signpost silage silane silencer silent
silhouette silica silicate siliceous silicic silicide silicon silicone
silicosis silk silken silkworm silky sill silly silo silt siltation
siltstone silty silver silversmith silverware silvery sima similar
simile similitude simmer simper simple simplectic simpleminded
simpleton simplex simplicial simplicity simplify simplistic simply
simulate simulcast simultaneity simultaneous sin since sincere sinew
sinewy sinful sing singable singe single singlehanded singlet
singleton singsong singular sinh sinister sinistral sink sinkhole
sinter sinuous sinus sinusoid sinusoidal sip sir sire siren sis sisal
siskin sister sit site situ situate situated situation situs siva six
sixfold sixgun sixteen sixteenth sixth sixtieth sixty size sizzle skat
skate skater skeet skeletal skeleton skeptic sketch sketchbook
sketchpad sketchy skew skewer ski skid skiddy skied skiff skill
skillet skillful skim skimp skimpy skin skindive skinny skip skipjack
skirmish skirt skit skitter skittle skulk skull skullcap skullduggery
skunk sky skydiving skyhook skyjack skylark skylight skyline skyrocket
skyscrape skyward skywave skyway skywriting slab slack slacken sladang
slag slain slake slam slander slanderous slang slant slap slapstick
slash slat slate slater slaughter slaughterhouse slave slavery slavic
slavish slay sled sledge sledgehammer sleek sleep sleepwalk sleepy
sleet sleety sleeve sleigh sleight slender slept sleuth slew slice
slick slicker slid slide slight slim slimy sling slingshot slip
slippage slipper slippery slit slither sliver slivery slob slobber
sloe slog slogan sloganeer slogging sloop slop slope sloppy slosh slot
sloth slothful slouch slough sloven slow slowdown sludge slug slugging
sluggish sluice slum slumber slump slung slur slurp slurry slut sly
smack small smaller smallholding smallish smallpox smalltime smart
smash smasher smatter smattering smear smell smelly smelt smile smirk
smith smithereens smithy smitten smog smoke smokehouse smokescreen
smokestack smoky smolder smooch smooth smoothbore smother smudge
smudgy smug smuggle smut smutty snack snafu snag snagging snail snake
snakebird snakelike snakeroot snap snapback snapdragon snapper
snappish snappy snapshot snare snark snarl snatch snazzy sneak sneaker
sneaky sneer sneeze snell snick snicker sniff sniffle sniffly snifter
snigger snip snippet snippy snivel snob snobbery snobbish snook
snooker snoop snoopy snore snorkel snort snorter snotty snout snow
snowball snowfall snowflake snowmobile snowshoe snowstorm snowy snub
snuff snuffer snuffle snuffly snug snuggle snuggly snyaptic so soak
soap soapstone soapsud soapsuds soapy soar sob sober sobriety
sobriquet soccer sociable social societal society socioeconomic
sociology sociometry sock socket sockeye sod soda sodden sodium sofa
soffit soft softball soften softhearted software softwood soggy
soignee soil soiree sojourn solace solar sold solder soldier soldiery
sole solecism solemn solemnity solenoid solicit solicitation solicitor
solicitous solicitude solid solidarity solidify solidus soliloquy
solipsism solitaire solitary soliton solitude solo solstice soluble
solute solution solvate solve solvent soma somal somatic somber sombre
some somebody someday somehow someone someplace somersault something
sometime somewhat somewhere sommelier somnambulism somnolent son
sonant sonar sonata song songbag songbook songful sonic sonnet sonny
sonogram sonority sonorous soon soot sooth soothe soothsay soothsayer
sop sophia sophism sophisticate sophistry sophomore sophomoric soprano
sora sorb sorcery sordid sore sorghum sorority sorption sorrel sorrow
sorrowful sorry sort sortie sou souffle sough sought soul soulful
sound soundproof soup sour sourberry source sourdough sourwood soutane
south southbound southeast southeastern southerly southern
southernmost southland southpaw southward southwest southwestern
souvenir sovereign sovereignty soviet sovkhoz sow sowbelly sown soy
soya soybean sozzled spa space spacecraft spacesuit spacetime spacious
spade spaghetti spalding span spandrel spangle spaniel spar spare
spareribs sparge spark sparkle sparkler sparky sparling sparrow sparse
spasm spastic spat spate spatial spatlum spatter spatterdock spatula
spavin spawn spay spayed speak speakeasy spear spearhead spearmint
spec special specialize specie species specific specification specify
specimen specious speck speckle spectacle spectacular spectator
spectra spectral spectrogram spectrograph spectrography spectrometer
spectrophotometer spectroscope spectroscopic spectroscopy spectrum
specular speculate sped speech speed speedboat speeding speedometer
speedup speedwell speedy spell spellbound spend spent sperm
spermatophyte spew sphagnum sphalerite sphere spheric spheroid
spheroidal spherule sphinx spice spicebush spicy spider spiderwort
spidery spigot spike spikenard spiky spill spilt spin spinach spinal
spindle spine spinnaker spinneret spinodal spinoff spinster spiny
spiral spire spirit spiritual spit spite spiteful spitfire spittle
spitz splash splashy splat splatter splay splayed spleen spleenwort
splendid splenetic splice spline splint splintery split splotch
splotchy splurge splutter spoil spoilage spoke spoken spokesman
spokesmen spokesperson sponge spongy sponsor spontaneous spoof spook
spooky spool spoon spoonerism spoonful sporadic spore sport sportsman
sportsmen sportswear sportswrite sportswriter sportswriting sporty
spot spotlight spotty spouse spout sprain sprang sprawl spray spread
spree sprig sprightly spring springboard springe springtail springtime
springy sprinkle sprint sprite sprocket sprout spruce sprue sprung
spud spume spumoni spun spunk spur spurge spurious spurn spurt sputnik
sputter spy spyglass squabble squad squadron squalid squall squamous
squander square squash squashberry squashy squat squatted squatter
squatting squaw squawbush squawk squawroot squeak squeaky squeal
squeamish squeegee squeeze squelch squid squill squint squire
squirehood squirm squirmy squirrel squirt squishy stab stabile
stability stabilize stable stableman stablemen staccato stack stadia
stadium staff stag stage stagecoach stager stagestruck stagger
stagnant stagnate stagy staid stain stair staircase stairway stairwell
stake stalactite stale stalemate stalk stall stallion stalwart stamen
stamina staminate stammer stamp stampede stance stanch stanchion stand
standard standby standeth standoff standpoint standstill stank stannic
stannous stanza staph staphylococcus staple star starboard starch
starchy stardom stare starfish stargaze stargazing stark starlet
starlight starling start startle startup starvation starve starveling
stash stasis state statement stater stateroom statesman statesmanlike
statesmen statewide static station stationarity stationary stationer
stationery stationmaster statistician stator statuary statue statuette
stature status statute statutory staunch stave stay stayed stead
steadfast steady steak steal stealth stealthy steam steamboat steamy
stearate stearic steed steel steelmake steelworks steely steep steepen
steeple steeplebush steeplechase steer steeve stein stella stellar
stem stench stencil stenographer stenography stenotype step stepchild
stephanotis stepmother steprelation stepson stepwise steradian stereo
stereography stereoscopy sterile sterling stern sternal sternum
steroid stethoscope stevedore stew steward stewardess stick stickle
stickleback stickpin sticktight sticky stiff stiffen stifle stigma
stigmata stile stiletto still stillbirth stillwater stilly stilt
stimulant stimulate stimulatory stimuli stimulus sting stingy stink
stinkpot stinky stint stipend stipple stipulate stir stirrup stitch
stochastic stock stockade stockbroker stockholder stockpile stockroom
stocktaking stocky stodgy stoic stoichiometry stoke stole stolen
stolid stomach stomp stone stonecrop stonewall stoneware stonewort
stony stood stooge stool stoop stop stopband stopcock stopgap stopover
stoppage stopwatch storage store storehouse storekeep storeroom stork
storm stormbound stormy story storyboard storyteller stout
stouthearted stove stow stowage stowaway strabismic strabismus
straddle stradivarius strafe straggle straight straightaway straighten
straightforward straightway strain strait straitened straitlaced
strand strange stranger strangle strangulate strangulation strap
straphanging strata stratagem strategic strategist strategy stratify
stratosphere stratospheric stratum straw strawberry strawflower stray
streak stream streamer streamline streamside street streetcar strength
strengthen strenuous streptococcus streptomycin stress stressful
stretch strewn striate striated stricken strict stricter stricture
stride strident strife strike strikebreak strikebreaking string
stringent stringy strip stripe stripling striptease stripy strive
striven strobe stroboscopic strode stroke stroll strong stronghold
strongroom strontium strop strophe strove struck structural structure
struggle strum strung strut strychnine stub stubble stubborn stubby
stucco stuck stud student studio studious study stuff stuffy stultify
stumble stump stumpage stumpy stun stung stunk stunner stunt
stupefaction stupefy stupendous stupid stupor sturdy sturgeon stutter
style styli stylish stylites stylus stymie styrene suave sub
subheading subject subjectivity subjunctive sublimate subliminal
submersible submissive submit submittal submitted submitting subpoena
subrogation subservient subsidiary subsidize subsidy subsist
subsistent substantial substantiate substantive substituent substitute
substitution substitutionary substrate subsume subsumed subsuming
subterfuge subterranean subtle subtlety subtly subtracter subtrahend
subtropical suburb suburbia subversive subvert succeed success
successful succession successive successor succinct succubus succumb
such suck suckling sucrose suction sud sudden suds sue suey suffer
sufferance suffice sufficient suffix suffocate suffrage suffragette
suffuse sugar sugarcoated suggest suggestible suggestion suggestive
suicidal suicide suit suitcase suitor sulfa sulfanilamide sulfate
sulfide sulfite sulfonamide sulfur sulfuric sulfurous sulk sulky
sullen sully sulphur sultan sultanate sultry sum sumac summand
summarily summary summate summation summer summertime summit summitry
summon sumptuous sun sunbaked sunbeam sunbonnet sunburn sunburnt
sunder sundew sundial sundown sundowner sundrenched sundry sunfish
sunflower sung sunglasses sunk sunken sunlight sunlit sunny sunrise
sunscreen sunset sunshade sunshine sunshiny sunspot suntan suntanned
suntanning sup super superannuate superb superbly supercharged
supercilious superconduct superconductivity superficial superficies
superfluity superfluous superintendent superior superlative
superlunary supernatant supernovae superposable supersede superstition
superstitious supervene supervisory supine supplant supple supplement
supplementary supplicate supply support supposable suppose supposition
suppress suppressible suppression suppressor supra supranational
supremacy supreme supremum surcease surcharge sure surefooted surety
surf surface surfactant surfeit surge surgeon surgery surgical
surjection surjective surly surmise surmount surname surpass surplus
surprise surreal surrender surreptitious surrey surrogate surround
surtax surtout surveillant survey surveyor survival survive survivor
susceptance susceptible sushi suspect suspend suspender suspense
suspension suspensor suspicion suspicious sustain sustenance suture
suzerain suzerainty svelte swab swabby swag swage swagger swain
swallow swallowtail swallowtailed swam swami swamp swampy swan swank
swanky swanlike swap swarm swart swarthy swashbuckling swastika swat
swatch swath swathe sway swear sweat sweatband sweater sweatshirt
sweaty sweep sweepstake sweet sweeten sweetheart sweetish swell swelt
swelter swept swerve swift swig swigging swim swimmingly swimsuit
swindle swine swing swingable swinger swingy swipe swirl swirly swish
swishy switch switchblade switchboard switchgear switchman swivel
swizzle swollen swoop sword swordfish swordplay swordtail swore sworn
swum swung sybarite sycamore sycophant sycophantic syenite syllabi
syllabic syllabify syllable syllabus syllogism syllogistic sylvan
symbiosis symbiotic symbol symbolic symmetry sympathetic sympathy
symphonic symphony symplectic symposia symposium symptom symptomatic
synagogue synapse synapses synaptic synchronism synchronous synchrony
synchrotron syncopate syndic syndicalism syndicate syndrome synergism
synergistic synergy synod synonym synonymous synonymy synopses
synopsis synoptic syntactic syntax syntheses synthesis synthetic
syphilis syringa syringe syrinx syrup syrupy system systematic
systemic systemization systemwide syzygy t tab tabernacle table
tableau tableaux tablecloth tableland tablespoon tablespoonful tablet
tabloid taboo tabor tabu tabula tabular tabulate tachinid
tachistoscope tachometer tacit tack tackle tacky tact tactful tactic
tactician tactile tactual tad tadpole taffeta taffy taft tag tagging
tail tailgate tailor tailspin tailwind taint take taken takeoff
takeover taketh talc talcum tale talent talisman talismanic talk
talkative talkie talky tall tallow tally tallyho talon talus tam
tamale tamarack tamarind tambourine tame tamp tamper tampon tan
tanager tandem tang tangent tangential tangerine tangible tangle tango
tangy tanh tank tannin tansy tantalum tantalus tantamount tantrum tao
taoism tap tapa tape taper tapestry tapeworm tapir tapis tappa tappet
tar tara tarantara tarantula tardy target tariff tarnish tarpaper
tarpaulin tarpon tarry tarsus tart tartar task taskmaster tassel taste
tasteful tasting tasty tat tatas tate tater tatter tattle tattler
tattletale tattoo tatty tau taught taunt taurus taut tautology tavern
taverna tawdry tawny tax taxation taxi taxicab taxied taxiway
taxonomic taxonomy taxpayer taxpaying tea teacart teach teacup
teahouse teakettle teakwood teal team teammate teamster teamwork
teapot tear teardrop tearful teargas tease teasel teaspoon teaspoonful
teat tech technetium technical technician technique technocrat
technocratic technology tectonic tecum ted tedious tedium tee teeing
teem teen teenage teens teensy teet teeter teeth teethe teethed
teething teetotal tektite telecommunicate telecommunications
teleconference telegram telegraph telegraphy telekinesis telemarketing
telemeter teleology teleost telepathic telepathy telephone telephonic
telephony telephotography teleprinter teleprocessing teleprompter
telescope telescopic telethon teletype teletypesetting teletypewrite
televise television tell teller telltale tellurium telly temerity
temper tempera temperament temperance temperate temperature tempest
tempestuous template temple tempo temporal temporary tempt temptation
temptress ten tenable tenacious tenacity tenant tend tendency
tenderfoot tenderhearted tenderloin tendon tenebrous tenement tenet
tenfold tenner tennis tenon tenor tense tensile tension tensional
tensor tenspot tent tentacle tentative tenterhooks tenth tenuity
tenuous tenure tepee tepid teratogenic teratology terbium tercel term
terminable terminal terminate termini terminology terminus termite
tern ternary terpsichorean terrace terrain terramycin terrapin
terrestrial terrible terrier terrific terrifically terrify territorial
territory terror terry terse tertiary tessellate tessellated test
testament testamentary testate testbed testes testicle testicular
testify testimonial testimony testis testy tetanus tete tether
tetrachloride tetrafluoride tetrafluouride tetragonal tetrahedra
tetrahedral tetrahedron tetravalent text textbook textile textual
textural texture thallium thallophyte than thank thankful thanksgiving
that thatch thaw the theatric thee theft their theism theist them
thematic theme themselves then thence thenceforth theocracy theologian
theology theorem theoretic theoretical theoretician theorist theory
therapeutic therapist therapy there thereabouts thereafter thereat
thereby therefor therefore therefrom therein thereof thereon thereto
theretofore thereunder thereupon therewith thermal thermionic
thermistor thermo thermodynamics thermos thermosetting thermostat
thesaurus these theses thesis thespian theta thews they thiamin thick
thicken thicket thickheaded thickish thief thieves thieving thigh
thimble thin thine thing think thinnish thiocyanate thiouracil third
thirst thirsty thirteen thirteenth thirtieth thirty this thistle
thistledown thither thong thoriate thorium thorn thorny thorough
thoroughbred thoroughfare thoroughgoing those thou though thought
thoughtful thousand thousandfold thousandth thrall thrash thread
threadbare threat threaten three threefold threesome threonine thresh
threshold threw thrice thrift thrifty thrill thrips thrive throat
throaty throb throes thrombosis throne throng throttle through
throughout throughput throw throwaway throwback thrown thrum thrush
thrust thud thug thuggee thulium thumb thumbnail thump thunder
thunderbird thunderbolt thunderclap thunderflower thunderous
thundershower thunderstorm thus thwack thwart thy thyme thymine thymus
thyratron thyroglobulin thyroid thyroidal thyronine thyrotoxic
thyroxine ti tibet tibia tic tick ticker ticket tickle tickler
ticklish tid tidal tidbit tiddleywinks tiddly tiddlywinks tide
tideland tidewater tidy tie tier tift tiger tight tighten tightfisted
tigress til tilde tile till tiller tilt tilth timber timberland timbre
time timely timeout timepiece timesaving timeserving timeshare
timetable timeworn timid timothy tin tincture tinder tinfoil tingaling
tinge tingle tinker tinkle tinsel tint tintype tiny tip tipoff tipple
tippy tipsy tiptoe tirade tire tiresome tissue tit titanate titanic
titanium tithe titian titillate title titmouse titrate titter titular
to toad toady toast toastmaster tobacco toccata today toddle toe
toenail toffee tofu tog together togetherness togging toggle togs toil
toilet toiletry toilsome tokamak token told tolerable tolerant
tolerate toll tollgate tollhouse toluene tomato tomatoes tomb
tombstone tome tommy tomograph tomography tomorrow ton tonal tone tong
tongue tonic tonight tonk tonnage tonsil tonsilitis tonsillitis tony
too toodle took tool toolkit toolmake toolsmith toot tooth toothbrush
toothpaste toothpick tootle top topaz topcoat topdressing topgallant
topic topical topmost topnotch topocentric topography topologize
topology topple topsoil tor torah torch tore tori torment torn tornado
toroid toroidal torpedo torpid torpor torque torr torrent torrid
torsion torso tort tortoise tortoiseshell tortuous torture torus tory
toss tot total totalitarian tote totem totemic totter touch touchdown
touchstone touchy tough tour tourism tournament tousle tout tow toward
towards towboat towel tower towhead towhee town townhouse townsman
townsmen toxic toxicology toxin toy trace traceable tracery trachea
track trackage tract tractable traction tractor trade trademark
tradeoff tradesman tradesmen tradition traffic trafficked trafficking
trag tragedian tragedy tragic tragicomic trail trailblaze trailer
trailhead trailside train trainee trainman trainmen traipse trait
traitor traitorous trajectory tram trammel tramp trample tramway
trance tranquil tranquillity transact transalpine transatlantic
transceiver transcend transcendent transcendental transconductance
transcontinental transcribe transcript transcription transducer
transduction transect transept transfer transferable transferee
transference transferor transferral transferred transferring
transfinite transfix transform transformation transformer transfusable
transfuse transfusion transgress transgression transgressor transient
transistor transit transition transitive transitory translate
transliterate translucent transmissible transmission transmit
transmittable transmittal transmittance transmitted transmitter
transmitting transmogrify transmutation transmute transoceanic transom
transpacific transparent transpiration transpire transplant
transplantation transpond transport transportation transposable
transpose transposition transship transshipped transshipping
transversal transverse transvestism transvestite trap trapezium
trapezoid trapezoidal trapshooting trash trashy trauma traumatic
travail travel travelogue traversable traversal traverse travertine
travesty trawl tray treacherous treachery tread treadle treadmill
treason treasonous treasure treasurer treasury treat treatise treaty
treble tree treetop trefoil trek trellis tremble tremendous tremor
tremulous trench trenchant trencher trencherman trenchermen trend
trendy trepidation trespass tress tresses trestle trews triable triac
triad trial triangle triangular triangulate triatomic tribal tribe
tribesman tribesmen tribulate tribunal tribune tributary tribute
triceps trichinosis trichloroacetic trichloroethane trichrome trick
trickery trickle trickster tricky trident tridiagonal tried triennial
trifle trifluoride trifluouride trig trigonal trigonometry trigram
trihedral trill trillion trillionth trilobite trilogy trim trimer
trimester trinitarian trinity trinket trio triode trioxide trip
tripartite triphenylphosphine triple triplet triplex triplicate tripod
tripoli tripos triptych trisodium tristate trisyllable trite tritium
triton triumph triumphal triumphant triune trivalent trivia trivial
trivium trod trodden troglodyte troika troll trolley trolleybus
trollop trombone trompe troop trophic trophy tropic tropopause
troposphere tropospheric trot troubador trouble troubleshoot
troublesome trough trounce troupe trouser trout troy truancy truant
truce truck truculent trudge true truehearted truism truly trump
trumpery trumpet truncate trundle trunk truss trust trustee trustful
trustworthy truth truthful try trypsin trytophan tsar tsarina tsunami
tub tuba tube tuber tuberculin tuberculosis tubular tubule tuck tucker
tuff tuft tug tugging tuition tularemia tulip tulle tum tumble tumbler
tumbleweed tumbrel tumult tumultuous tumulus tun tuna tundra tune
tuneful tung tungstate tungsten tunic tunnel tupelo tuple turban
turbid turbidity turbinate turbine turbofan turbojet turbulent turf
turgid turk turkey turmoil turn turnabout turnaround turnery turnip
turnkey turnoff turnout turnover turnpike turnstone turntable
turpentine turpitude turquoise turret turtle turtleback turtleneck
turvy tusk tussle tutelage tutor tutorial tutu tuxedo twaddle twain
tweak tweed tweedy tweeter tweeze tweezers twelfth twelve twentieth
twenty twice twiddle twig twigging twilight twill twin twinge twinkle
twirl twirly twist twisty twit twitch twitchy twitter two twofaced
twofold twosome tycoon type typeface typescript typeset typesetter
typesetting typewrite typewritten typhoid typhoon typhus typic typify
typo typographer typography typology tyrannic tyrannicide
tyrannosaurus tyranny tyrant tyrosine u ubiquitous ubiquity ugh ugly
ulcer ulcerate ulterior ultimate ultimatum ultra umber umbilical
umbilici umbilicus umbra umbrage umbrella umlaut umpire unable
unaccompanied unanimous unary unassuming unavailing unawares
unbeknownst unbelieving unbidden unblushing unchristian uncle
uncommitted uncommonly uncompromising uncouth uncritical unction under
underbelly underclassman underclassmen underclothes underling
underlying undermanned underpants understaffed undertaker undies
undulate unduly undying unearthly unerring unfailing unfaltering
unfeeling unflagging unflinching ungainly ungodly ungrudging unholy
uniaxial unicorn unidentified unidimensional unidirectional uniform
unify unilateral unimodal unimodular uninominal union uniplex unipolar
uniprocessor unique unisex unison unit unital unitarian unitary unite
unity univalent univariate universal universe university unkempt
unknowing unlikely unmannerly unmarried unqualified unquestioning
unreasoning unrelenting unremitting unrivalled unruly unseeing
unseemly unsightly unskilled unsparing unspotted unstudied unsullied
unswerving untapped unthinking until untimely untiring unwieldy
unwitting up upbeat upbraid upbring upbringing upcome upcoming update
updraft upend upgrade upheaval upheld uphill uphold upholster
upholstery upkeep upland uplift upon upper upperclassman upperclassmen
uppercut uppermost uppity upraise upright uprise uprising upriver
uproar uproarious uproot upset upsetting upshot upside upsilon upslope
upstair upstairs upstand upstanding upstart upstate upstater upstream
upsurge upswing uptake uptown uptrend upturn upward upwind uracil
urania uranium uranus uranyl urban urbane urbanite urchin urea uremia
urethane urethra urge urgency urgent urging urinal urinary urine urn
us usable usage use useful usher usual usually usurer usurious usurp
usurpation usury utensil uterine uterus utile utilitarian utility
utilize utmost utopia utopian utter utterance uttermost v vacant
vacate vacation vacationland vaccinate vaccine vacillate vacua vacuity
vacuo vacuolate vacuole vacuous vacuum vade vagabond vagary vagina
vaginal vagrant vague vain vainglorious valance vale valediction
valedictorian valedictory valency valent valentine valet valeur
valiant valid validate valine valley valor valuate value valve vamp
vampire van vanadium vandal vane vanguard vanilla vanish vanity
vanquish vantage vapid vaporize vaporous variable variac variant
variate varicolored varicoloured variegate variegated variety various
varistor varnish varsity vary vascular vase vasectomy vassal vast vat
vaudeville vault vaunt veal vector vectorial vee veer veery vegetable
vegetarian vegetate vegetation vehement vehicle vehicular veil vein
velar veldt vellum velocity velours velvet velvety venal vend vendetta
vendible vendor veneer venerable venerate venereal vengeance vengeful
venial venison venom venomous venous vent ventilate ventricle
ventriloquism venture venturesome venturi veracious veracity veranda
verandah verb verbal verbatim verbena verbiage verbose verbosity
verdant verdict verdigris verge verger veridic verify verisimilitude
veritable verity vermeil vermiculite vermilion vermin vermouth
vernacular vernal vernier versa versatec versatile verse version
versus vertebra vertebrae vertebral vertebrate vertex vertical
vertices vertigo verve very vesicular vesper vessel vest vestal
vestibule vestige vestigial vestry vet vetch veteran veterinarian
veterinary veto vex vexation vexatious vi via viable viaduct vial
viands vibes vibrant vibrate vibrato viburnum vicar vicarious vice
viceroy vicinal vicinity vicious vicissitude vicissitudes victim
victor victorious victory victrola victual vide video videotape vie
view viewpoint viewport vigil vigilant vigilante vigilantism vignette
vigorous vii viii viking vile vilify villa village villain villainous
villein vindicate vindictive vine vinegar vineyard vintage vintner
vinyl viola violate violence violent violet violin viper virgin
virginal virgule virile virtual virtue virtuosi virtuosity virtuoso
virtuous virulent virus vis visa visage viscera visceral viscoelastic
viscometer viscosity viscount viscous vise visible vision visionary
visit visitation visitor visor vista visual vita vitae vital vitamin
vitiate vitreous vitrify vitriol vitriolic vitro viva vivace vivacious
vivacity vivid vivify vivo vixen viz vocable vocabularian vocabulary
vocal vocalic vocate vocative vociferous vogue voice voiceband void
volatile volcanic volcanism volcano volition volley volleyball volt
voltage voltaic voltmeter voluble volume volumetric voluminous
voluntarism voluntary volunteer voluptuous vomit von voodoo voracious
vortex vortices vorticity votary vote votive vouch voucher vouchsafe
vow vowel voyage vulgar vulnerable vulpine vulture w wack wacke wacky
wad waddle wade wadi wafer waffle wag wage wager wagging waggle
wagoneer wah wail wainscot waist waistcoat waistline wait waitress
waive wake wakeful waken wakerobin wakeup wale walk walkie walkout
walkover walkway wall wallaby wallboard wallet wallop wallow wallpaper
wally walnut walrus waltz waltzing wan wand wander wane wangle want
wanton wapato wapiti war warble ward warden warder wardrobe wardroom
ware warehouse warehouseman warfare warhead warlike warm warmhearted
warmish warmonger warmth warmup warn warp warplane warrant warranty
warren warrior wart wartime warty wary was wash washbasin washboard
washbowl washout washy wasp waspish wast wastage waste wastebasket
wasteful wasteland wastewater wastrel watch watchband watchdog
watchful watchmake watchman watchmen watchword water watercourse
waterfall waterfront waterline waterlogged watermelon waterproof
watershed waterside waterway waterwings waterworks watery watt wattage
wattle wave waveform wavefront waveguide wavelength wavelet wavenumber
waver wavy wax waxen waxwork waxworks waxy way waybill wayfaring
waylaid waylay wayside wayward we weak weaken weakling weal wealth
wealthy wean weapon weaponry wear wearied wearisome weary weasel
weather weatherbeaten weatherproof weatherstrip weatherstripping weave
web weber wed wedded wedding wedge wedlock wee weed weedy week weekday
weekend weep weigh weight weighty weir weird welcome weld welfare well
wellbeing wellington wellspring welsh welt welter went wept were wert
west westbound westerly western westernmost westward wet wetland whack
whacker whale wham wharf wharves what whatever whatnot whatsoever
wheat whee wheedle wheel wheelbase wheelchair wheelhouse wheeze wheezy
whelk whelm whelp when whence whenever where whereabout whereabouts
whereas whereby wherefore wherein whereof whereon wheresoever
whereupon wherever wherewith wherewithal whet whether which whichever
whiff whig while whim whimper whimsey whimsic whine whinny whip
whiplash whippet whipsaw whir whirl whirligig whirlpool whirlwind
whish whisk whisker whisper whistle whistleable whit white whiteface
whitehead whiten whitetail whitewash whither whittle whiz whizzing who
whoa whoever whole wholehearted wholesale wholesome wholly whom
whomever whomsoever whoop whoosh whop whopper whore whose whosoever
whup why wick wicker wicket wide widen widespread widgeon widget widow
widower widowhood width widthwise wield wiener wife wig wigging wiggle
wiggly wigmake wigwam wild wildcat wildcatter wilderness wildfire
wildlife wile wilful will willful willies willow willowy wilt wily win
wince winch wind windbag windbreak windfall windmill window windowpane
windowsill windshield windstorm windsurf windup windward windy wine
winebibbing winemake winemaster winery wineskin wing wingback wingman
wingmen wingspan wingtip wink winkle winnow wino winsome winter
wintertime wintry winy wipe wire wirecutters wireman wiremen wiretap
wiretapper wiretapping wiry wisdom wise wiseacre wisecrack wisenheimer
wish wishbone wishful wishy wisp wispy wistful wit witch witchcraft
with withal withdraw withdrawal withdrawn withdrew withe wither
withheld withhold within without withstand withstood withy witness
witty wive wizard wizened wobble woe woebegone woeful wok woke wold
wolf wolfish wolve wolves woman womanhood womb wombat women won wonder
wonderful wonderland wondrous wont woo wood woodcarver woodcock
woodcut woodcutter wooden woodenheaded woodgrain woodhen woodland
woodlot woodpeck woodrow woodruff woodshed woodside woodward woodwind
woodwork woody woodyard woofer wool woolgather wop word wordy wore
work workaday workbench workbook workday workforce workhorse workload
workman workmanlike workmen workout workpiece workplace worksheet
workshop workspace workstation worktable world worldshaking worldwide
worm wormy worn worrisome worry worse worsen worship worshipful worst
worth worthwhile worthy would wound wove woven wow wrack wraith
wrangle wrap wrapup wrath wrathful wreak wreath wreathe wreck wreckage
wrench wrest wrestle wretch wriggle wright wring wrinkle wrist
wristband wristwatch writ write writeup writhe written wrong wrongdo
wrongdoer wrongdoing wrongful wrongheaded wrote wrought wry wynn x
xenon xenophobia xerography xerox xi xylem xylene xylophone y yacht
yachtsman yachtsmen yah yak yam yammer yang yank yap yapping yard
yardage yardstick yarmulke yarn yarrow yaw yawl yawn ye yea yeah year
yearbook yearling yearn yeast yeasty yell yellow yellowish yelp yen
yeoman yeomanry yeshiva yesterday yesteryear yet yield yin yip yipping
yodel yoga yoghurt yogi yogurt yoke yokel yolk yon yond yonks yore you
young youngish youngster your yourself yourselves youth youthful yow
ytterbium yttrium yucca yuck yuh yule z zag zagging zap zazen zeal
zealot zealous zebra zenith zero zeroes zeroth zest zesty zeta zig
zigging zigzag zigzagging zilch zinc zing zionism zip zippy zircon
zirconium zloty zodiac zodiacal zombie zone zonked zoo zoology zoom
zounds zucchini zygote abrams achilles acropolis adams agnes aires
alexander alexis alfred algiers alps amadeus ames amos andes angeles
annapolis antilles archimedes arkansas asher ashly athens atkins
atlantis avis bahamas bangor barbados barger bering brahms brandeis
bruxelles cairns camoros camus carlos celts chalker charles cheops
ching cocos collins columbus confucius conners connolly copernicus
cramer cyclops cygnus cyprus dallas damascus daniels davies davis
decker denning dennis descartes dickens doris douglas downs dreyfus
dukakis dulles dumfries ecclesiastes edwards emily erasmus euphrates
evans everglades fairbanks federales fisher fitzsimmons fleming forbes
fowler france francis goering goodling goths grenadines guiness hades
harding harris hastings hawkes hawking hayes heights hercules
himalayas hippocrates hobbs holmes honduras hopkins hughes humphreys
illinois indianapolis inverness iroquois irving isaacs italy james
jarvis jeffreys jesus jones josephus judas julius kansas keynes
kipling kiwanis lansing laos leeds levis leviticus lewis louis
maccabees madras maimonides maldive massachusetts matthews mauritius
memphis mercedes midas mingus minneapolis mohammed moines morris moses
myers myknos nablus nanjing nantes naples neal nevis nostradamus
oedipus olympus orleans orly papas paris parker pauling peking
pershing peter peters philippines phineas pisces pryor pythagoras
queens rabelais ramses reynolds rhodes richards robins rodgers rogers
rubens sagittarius seychelles socrates texas thames thomas tiberias
tunis venus vilnius wales warner wilkins williams wyoming xmas yonkers
zeus frances
"""

HEADWORDS = tuple(_HEADWORDS_TEXT.split())


def build_dictionary() -> dict[str, tuple[bool, str]]:
    """variant -> (is_exception, root); insertion is first-wins like
    kstem_add_table_entry (duplicates ignored), in loadTables order:
    exceptions, then headwords, then conflations."""
    d: dict[str, tuple[bool, str]] = {}
    for w in EXCEPTIONS.split():
        d.setdefault(w, (True, ""))
    for w in HEADWORDS:
        d.setdefault(w, (False, ""))
    for v, root in CONFLATIONS:
        d.setdefault(v, (False, root))
    return d
