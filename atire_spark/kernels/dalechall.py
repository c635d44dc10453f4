"""Dale-Chall familiar-word list — the data table from the
reference readability measure (readability_dale_chall_wordlist.h:
the published Dale-Chall 3000 list expanded with inflections, 11754
entries).  Data, not code: stored as one whitespace-joined string,
parsed once at import.

The Dale-Chall grade formula (readability_dale_chall.c:188):
score = 1000 * (0.049 * words/sentences
                + 15.79 * unfamiliar/words + 3.6365), truncated to
an integer (set_document_detail stores longs), 0 for empty docs.
"""

_WORDS = """
a able abler ables ablest aboard about abouts above aboves absent absented
absenter absenting absents accept accepted accepter accepting accepts
accident accidented accidents account accounted accounter accounting accounts
ache ached acher aches aching acid acider acids acorn acorned acorns across
act acted acting action actioner actiones actions acts add added adder adding
addition additions addr address addressed addresser addresses addressing adds
adjust adjusted adjuster adjusting adjustment adjustments adjusts admire
admired admirer admires admiring admission admissions adore adored adorer
adores adoring adult adulter adults adventure adventured adventurer
adventures adventuring advice advices afraid after afternoon afternoons
afters afterward afterwards again against age aged ageing ager ages aging ago
agoing agos agree agreed agreeing agreer agrees agreing ah ahead ahs aid
aided aider aides aiding aids aim aimed aimer aiming aims air aired airer
airest airier airiest airing airline airliner airlines airport airports airs
airy alarm alarmed alarming alarms album albums alike alive alives all aller
alley alleyed alleys alligator alligatored alligatoring alligators alls
almost alone along alongside aloud alphabet alphabeted alphabeting alphabets
already also always am amaze amazed amazement amazements amazer amazes
amazing america american americans americas ammer among amount amounted
amounter amounting amounts an and anded andes anding ands anes angel angeled
angeles angeling angels anger angered angering angers angrier angriest angry
animal animals ankle ankled ankles ankling announce announced announcement
announcements announcer announces announcing another ans answer answered
answerer answering answers ant anted antes anting ants any anybodies anybody
anybodyd anyhow anyone anything anythings anyway anyways anywhere anywheres
apart apartment apartments ape aped aper apes apiece apieces aping appear
appeared appearer appearing appears applause applauses apple appled apples
appling april apron aproned aproning aprons are area aread arear areas ared
ares arest arise arised ariser arises arising arithmetic arithmetics arm
armed armer armied armies arming arms army around arrange arranged arranger
arranges arranging arrest arrested arrester arresting arrests arrive arrived
arriver arrives arriving arrow arrowed arrowhead arrowheaded arrowheads
arrowing arrows art arter artist artistes artists arts as ash ashed asher
ashes ashing aside asides ask asked asker asking asks asleep ass astronaut
astronauts at ate ated ates ating atlas atlases attack attacked attacker
attacking attacks attend attended attender attending attends attention
attentions atter august auguster augustest aunt aunter aunts author authored
authoring authors auto autoed autoing automobile automobiled automobiles
automobiling autor autos autumn autumns avenue avenues awake awaked awaken
awakened awakener awakening awakens awakes awaking award awarded awarder
awarding awards away aways awful awfuller awhile ax axe axed axer axes axing
baa baaed baaing baar baas babied babies baby baby-sitter babying back
backache backaches backaching backed backer background backgrounds backing
backs backtrack backtracked backtracker backtracking backtracks backward
backwards bacon baconer bacons bad badge badged badger badges badging bads
bag baggage baggager baggages bagged bagger bagging bags bait baited baiter
baiting baits bake baked baker bakeries bakery bakes baking balance balanced
balancer balances balancing ball balled baller balling balloon ballooned
ballooner ballooning balloons ballpoint ballpoints balls banana bananas band
bandage bandaged bandager bandages bandaging banded bander banding bands bang
banged banger banging bangs banjo banjoes banjos bank banked banker banking
banks bar barbecue barbecued barbecueing barbecuer barbecues barbecuing
barber barbered barbering barbers bard bare bared barefoot barefooted barer
bares barest baring bark barked barker barking barks barn barns barr barred
barrel barreled barreler barreling barrelled barrelling barrels barrer barres
barring bars base baseball baseballer baseballs based basement basements
baser bases basest basing basket basketball basketballer basketballs
basketing baskets bat bated bater bates bath bathe bathed bather bathes
bathing bathroom bathroomed bathrooms baths bating bats batted batter batting
battle battled battler battles battling be beach beached beacher beaches
beaching bead beaded beader beading beads beak beaked beaker beaks beam
beamed beamer beaming beams bean beaned beaner beaning beans bear beard
bearded bearder bearding beards beared bearer bearing bears beast beasts beat
beater beating beats beautied beauties beautiful beauty beaver beavered
beavering beavers became because become becomed becomes becoming bed bedroom
bedrooms beds bedspread bedspreads bee beef beefed beefer beefing beefs
beefsteak beefsteaks been beer beers bees beest beet beets before beg began
beggar beggared beggarer beggaring beggars begged begger begging begin
beginner beginning begins begs begun behave behaved behaver behaves behaving
behind behinder behinds being belief beliefs believe believed believer
believes believing bell belled belles bellied bellies belling bells belly
bellyer bellying belong belonged belonger belonging belongings belongs below
belows belt belted belter belting belts bench benched bencher benches
benching bend bended bender bending bends beneath bent benting bents ber
berried berrier berries berry berrying bes beside besides best bested bester
besting bests bet betes bets betted better bettered betterer bettering
betters betting between betweens beyond beyonds bib bible bibles bibs bicycle
bicycled bicycler bicycles bicycling bier big bigged bigger bigging bigness
bignesses bill billed biller billfold billfolds billing billion billions
bills bing bingo bingos bird birded birder birding birds birth birthday
birthdays birthed birthing births biscuit biscuiting biscuits bit bite bited
biter bites biting bits bitted bitter bittered bitterer bitterest bittering
bitters bitting black blackboard blackboards blacked blacker blackest
blacking blackness blacknesses blacks blacksmith blacksmithing blacksmiths
blame blamed blamer blames blaming blank blanked blanker blankest blanket
blanketed blanketer blanketing blankets blanking blanks blast blasted blaster
blasting blastoff blastoffs blasts blaze blazed blazer blazes blazing bleed
bleeder bleeding bleeds bless blessed blesser blesses blessing blew blind
blinded blinder blindest blindfold blindfolded blindfolder blindfolding
blindfolds blinding blinds blink blinked blinker blinkered blinkering
blinkers blinking blinks block blocked blocker blocking blocks blond blonde
blonder blondes blondest blonds blood blooded bloodhound bloodhounds blooding
bloods bloodstream bloodstreams bloom bloomed bloomer blooming blooms blossom
blossomed blossoming blossoms blot blots blotted blotter blotting blouse
bloused blouses blousing blow blowed blower blowing blows blue blueberries
blueberry blued blueing bluer blues bluest bluing blush blushed blusher
blushes blushing board boarded boarder boarding boards boat boated boater
boating boats bobwhite bobwhites bodied bodier bodies boding body bodyguard
bodyguards bodying boil boiled boiler boiling boils boing bold bolded bolder
boldest bolding bolt bolted bolter bolting bolts bomb bombed bomber bombes
bombing bombs bone boned boner bones boning bonnet bonneted bonneter
bonneting bonnets boo bood booed booing book booked booker booking books boom
boomed boomer booming booms boor boos boot booted booter bootes booting boots
born borning borrow borrowed borrower borrowing borrows boss bossed bosser
bosses bossing both bother bothered botherer bothering bothers bottle bottled
bottler bottles bottling bottom bottomed bottomer bottoming bottoms bought
boulder bouldered bouldering boulders bounce bounced bouncer bounces bouncing
bow bow-wow bowed bower bowing bowl bowled bowler bowles bowling bowls bows
box boxcar boxcars boxed boxer boxes boxing boy boyer boys brace braced
bracelet braceleted bracelets bracer braces bracing brain brained brainer
braining brains brake braked braker brakes braking bran branch branched
brancher branches branching brand brand-new branded brander branding brands
branned branner branning brans brass brassed brasser brasses brassing brave
braved braver braveries bravery braves bravest braving bread breaded breading
breads break breaker breakfast breakfasted breakfaster breakfasting
breakfasts breaking breaks breast breasted breaster breasting breasts breath
breathe breathed breather breathes breathing breaths breeze breezed breezes
breezing brick bricked bricker bricking bricks bride brides bridge bridged
bridger bridges bridging bright brighten brightened brightener brightening
brightens brighter brightest brights bring bringed bringer bringing brings
broad broadcast broadcasted broadcaster broadcasting broadcasts broader
broadest broads broke broken broken-hearted broker brokes broking brook
brooked brooking brooks broom broomed broomer brooming brooms brother
brothered brothering brotherred brothers brought brown browned browner
brownest brownie brownier brownies browniest browning browns brush brushed
brusher brushes brushing bubble bubbled bubbler bubbles bubbling bucket
bucketed bucketer bucketing buckets buckle buckled buckler buckles buckling
bud budge budged budger budges budging buds buffalo buffaloed buffaloes
buffaloing buffalos bug bugged bugger buggier buggies buggiest bugging buggy
bugs build builded builder building buildings builds bulb bulbed bulbs bull
bulled buller bullet bulleted bulleting bullets bulling bulls bumblebee
bumblebees bump bumped bumper bumpier bumpiest bumping bumps bumpy bun bunch
bunched buncher bunches bunching bund bundle bundled bundler bundles bundling
bunk bunked bunker bunking bunks bunnies bunning bunny buns burglar burglars
buried burier buries burn burned burner burning burns burnt burro burros
burst bursted burster bursting bursts bury burying burys bus bused buses bush
bushed bushel busheled busheler busheling bushelled busheller bushelling
bushels busher bushes bushing busied busier busies busiest business
businesses busing buss busy busying but butcher butchered butcherer
butchering butchers buts butted butter buttered butterer butterflied
butterflies butterfly butterflyer butterflying buttering butters butterscotch
butterscotches buttes butting button buttoned buttoner buttoning buttons buy
buyer buying buys buzz buzzed buzzer buzzes buzzing by bye byes bys cab
cabbage cabbaged cabbages cabbaging caber cabin cabined cabining cabins cabs
cage caged cager cages caging cake caked caker cakes caking calendar
calendared calendarer calendaring calendars calf calfs call called caller
calles calling calls came camel camels camera cameras cames camp camped
camper camping camps can canal canaled canaler canales canaling canalled
canaller canalling canals canaries canary cand candied candier candies candle
candled candler candles candling candy candying candys cane caned caner canes
caning canned canner canning cannon cannoned cannoning cannons cannot canoe
canoed canoeing canoes canoing cans canyon canyons cap cape caped caper capes
caping capital capitaled capitaling capitals capped capper capping caps
capsule capsuled capsuler capsules capsuling captain captained captaining
captains capture captured capturer captures capturing car card cardboard
cardboards carded carder carding cards care cared careful carefuller
carefully careless carer cares carest caring carload carloading carloads
carpenter carpentered carpentering carpenters carpet carpeted carpeting
carpets carr carriage carriages carried carrier carries carrot carroter
carroting carrots carry carryed carrying carrys cars cart carted carter
cartes carting cartoon cartooned cartooning cartoons carts carve carved
carver carves carving case cased caser cases cash cashed casher cashes
cashier cashiered cashierer cashiering cashiers cashing casing castle castled
castles castling cat catch catched catcher catches catching cater caterpillar
caterpillared caterpillars cates cating cats catsup catsups catted catter
catting cattle caught cause caused causer causes causing cave caved caver
caves caving ceiling ceilinged ceilings celebrate celebrated celebrater
celebrates celebrating celebration celebrations cell cellar cellared cellarer
cellaring cellars celled celling cells cent center centered centerer
centering centers cents cereal cereals certain certainer certainest chain
chained chainer chaines chaining chains chair chaired chairer chairing chairs
chalk chalkboard chalkboards chalked chalker chalking chalks champion
championed championing champions chance chanced chancer chances chancing
change changed changer changes changing channel channeled channeler
channeling channelled channeller channelling channels chapter chaptered
chaptering chapters charge charged charger charges charging charm charmed
charmer charming charms chart charted charter charting charts chase chased
chaser chases chasing chatter chattered chatterer chattering chatters cheap
cheaper cheapest cheaping cheaps cheat cheated cheater cheating cheats check
checked checker checkers checking checks checkup checkups cheer cheered
cheerer cheerful cheerfuller cheerfully cheering cheers cheese cheeseburger
cheeseburgers cheesed cheeser cheeses cheesing cherried cherries cherry
cherrying chest chested chester chestnut chestnuts chests chew chewed chewer
chewing chews chick chicken chickened chickening chickens chicker chicks
chief chiefer chiefest chiefs child childed childes childhood childhoods
childing children chili chilies chill chilled chiller chillest chillier
chillies chilliest chilling chills chilly chimney chimneyed chimneying
chimneys chimpanzee chimpanzees chin china chinar chinas chined chines
chining chinned chinner chinning chins chip chipmunk chipmunks chipped
chipper chipping chips chirp chirped chirper chirping chirps chocolate
chocolates choice choicer choices choicest choke choked choker chokes choking
choose chooser chooses choosing chop chopped chopper chopping chops chorus
chorused choruser choruses chorusing chose chosen choses chosing christmas
christmases church churched churches churching churn churned churner churning
churns cigarette cigarettes circle circled circler circles circling circus
circuses citied cities citing citizen citizens city clap clapped clapper
clapping claps class classed classer classes classing classroom classrooms
claw clawed clawer clawing claws clay clayed clayer claying clays clean
cleaned cleaner cleanest cleaning cleans cleanser cleansers clear cleared
clearer clearest clearing clears clerk clerked clerking clerks clever
cleverer cleverest click clicked clicker clicking clicks climate climates
climb climbed climber climbing climbs clip clipped clipper clipping clips
clock clocked clocker clocking clocks close closed closer closes closest
closet closeted closeting closets closing cloth clothed clothes clothing
cloths cloud clouded cloudier cloudiest clouding clouds cloudy clown clowned
clowning clowns club clubhouse clubhouses clubs coach coached coacher coaches
coaching coachs coal coaled coaler coaling coals coast coasted coaster
coasting coasts coat coated coater coating coats cob cobs cobweb cobwebs
cocktail cocktailed cocktailing cocktails cocoa cocoas coconut coconuts
coffee coffees coin coined coiner coining coins cold colder coldest colds
collar collard collared collaring collars collect collected collecting
collection collectioner collections collector collectors collects college
colleger colleges color colored colorer colorful coloring colors colour
coloured colourer colourful colouring colours colt colter colts column
columned columner columning columns comb combed comber combes combing combs
come comer comes comfort comfortable comforted comforter comforting comforts
comic comices comics coming comma commaes commaing command commanded
commander commanding commands commas commercial commercials companied
companies company companying complete completed completer completes
completest completing computer computers concrete concreted concreter
concretes concreting conductor conductors cone coned coner cones coning
connect connected connecter connecting connects contest contested contester
contesting contests continue continued continuer continues continuing control
controled controling controlled controller controlling controls cook cooked
cooker cookie cookies cooking cooks cooky cool cooled cooler coolest cooling
cools copied copier copies coping copy copying cord corded corder cording
cords cork corked corker corking corks corn corned corner cornered cornerer
cornering corners corning cornmeal cornmeals corns correct corrected
correcter correctest correcting corrects cosied cosier cosies cosiest cosing
cost costed coster costing costs cosy cosying cottage cottaged cottager
cottages cotton cottoned cottoner cottoning cottons couch couched coucher
couches couching cough coughed cougher coughing coughs could couldest count
counted counter countered countering counters counting countries country
counts course coursed courser courses coursing court courted courter courting
courts cousin cousins cover covered coverer covering covers cow coward
cowards cowboy cowboys cowed cower cowing cows cozied cozier cozies coziest
cozing cozy cozying crab craber crabs crack cracked cracker crackers cracking
cracks cradle cradled cradler cradles cradling cranberries cranberry crank
cranked cranker crankest cranking cranks crash crashed crasher crashes
crashing crawl crawled crawler crawling crawls crayon crayoned crayoning
crayons crazier crazies craziest crazing crazy cream creamed creamer creamier
creamiest creaming creams creamy creature creatures creek creeker creeks
creep creeper creeping creeps crib cribs cricket cricketed cricketer
cricketing crickets cried crier cries crime crimes cripple crippled crippler
cripples crippling crisp crisped crisper crispest crisping crisps croak
croaked croaker croaking croaks crook crooked crooking crooks crop cropped
cropper cropping crops cross crossed crosser crosses crossest crossing
crosswalk crosswalks crossways crow crowd crowded crowder crowding crowds
crowed crower crowing crown crowned crowner crowning crowns crows cruel
crueler cruelest crueller cruels crumb crumbed crumber crumbing crumble
crumbled crumbles crumbling crumbs crush crushed crusher crushes crushing
crust crusted cruster crusting crusts crutch crutched crutcher crutches
crutching cry crying cub cubed cuber cubes cubing cubs cup cupboard cupboards
cupful cupfuls cupped cupper cupping cups cure cured curer cures curing curl
curled curler curlier curliest curling curls curly curtain curtained
curtaining curtains curve curved curver curves curving cushion cushioned
cushioning cushions customer customers cut cute cuter cutes cutest cuts
cutted cutter cutting d dad daddies dadding daddy daddy-long-legs dading dads
dailies daily dairies dairy dairying daisied daisies daising daisy dam damage
damaged damager damages damaging dames dammed dammer damming damp damped
damper dampest damping damps dams dance danced dancer dances dancing dandier
dandies dandiest dandy danger dangered dangering dangerous dangers dare dared
darer dares daring dark darked darker darkest darking darkness darknesses
darks darling darlings dart darted darter darting darts dash dashed dasher
dashes dashing date dated dater dates dating daughter daughters dawn dawned
dawning dawns day daying daylight daylighted daylighting daylights days
daytime daytimes dead deader deadest deading deads deaf deafer deafest deal
dealer dealing deals dear dearer dearest dears death deaths december decide
decided decider decides deciding deck decked decker decking decks deep deeper
deepest deeping deeps deer deers defend defended defender defending defends
delighted deliver delivered deliverer deliveries delivering delivers delivery
den denes denned denning dens dentist dentists depend depended depender
depending depends deposit deposited depositing deposits describe described
describer describes describing desert deserted deserter deserting deserts
design designed designer designing designs desire desired desirer desires
desiring desk desks destroy destroyed destroyer destroying destroys detective
detectives detergent detergents devil deviled deviler deviling devilled
devilling devils dew dewed dewer dewing dews dial dialed dialer dialing
dialled dialler dialling dials diamond diamonded diamonding diamonds dice
diced dicer dices dicing dictionaries dictionary did didest die died dieing
dier dies diet dieted dieter dieting diets dietted difference differenced
differences differencing different difficult difficulties difficulty dig
digest digged digger digging digs dim dime dimer dimes dimmed dimmer dimming
dims dine dined diner dines ding-dong dining dinner dinners dinosaur
dinosaurs dip dipped dipper dipping dips direct directed directer directest
directing direction directions directs dirt dirtied dirtier dirties dirtiest
dirts dirty dirtying disagree disagreed disagreeing disagreer disagrees
disagreing disappear disappeared disappearer disappearing disappears discover
discovered discoverer discovering discovers disease diseased diseases
diseasing disgrace disgraced disgraceful disgracer disgraces disgracing dish
dished disher dishes dishing dismiss dismissed dismisser dismisses dismissing
distance distanced distances distancing ditch ditched ditcher ditches
ditching dive dived diver dives divest divide divided divider divides
dividing diving do dock docked docker docking docks doctor doctored doctoring
doctors dod dodge dodged dodger dodges dodging doer does doest dog doges
dogged dogger dogging dogs doing doll dollar dollars dolled dollied dollier
dollies dolling dolls dolly dollying done donkey donkeys door doored dooring
doors doorstep doorsteps dope doped doper dopes doping dor dos dot doted
doter dotes doting dots dotted dotter dotting double doubled doubler doubles
doubling dove dover doves down downed downer downing downs downstairs
downtown downtowner downtowns downward downwards dozen dozened dozener
dozening dozens drag dragged dragger dragging dragon dragons drags drain
drained drainer draining drains drank draw drawer drawing draws dream dreamed
dreamer dreaming dreams dress dressed dresser dresses dressing drew dried
drier dries driest drill drilled driller drilling drills drink drinker
drinking drinks drip dripped dripper dripping drips drive driver drives
driveway driveways driving drop dropped dropper dropping drops drove droved
drover droves droving drown drownd drowned drowner drowning drowns drowsier
drowsiest drowsing drowsy drug drugged drugger drugging drugs drugstore
drugstores drum drummed drummer drumming drums drunk drunker drunkest drunks
dry dryer dryest drying drys duck ducked ducker ducking duckling ducklings
ducks due duer dues dug dugs dull dulled duller dullest dulling dulls dumb
dumbed dumber dumbest dumbing dumbs dump dumped dumper dumping dumps during
dust dusted duster dustier dustiest dusting dusts dusty dying dyings each
eager eagerer eagerest eagers eagle eagled eagles eagling ear earache
earaches eardrum eardrums eared earing earlier earliest early earn earned
earner earnest earning earnings earns earring ears earth earthed earthing
earthquake earthquaked earthquakes earthquaking earths easier easies easiest
easing east easted easter eastering eastern easterner easters easting easts
easy eat eaten eater eating eats edge edged edger edges edging education
educations egg egged egger egging eggs eight eighteen eighteens eighth
eighthes eighths eighties eights eighty either elastic elastics elbow elbowed
elbower elbowing elbows election elections electric electricities electricity
electrics elephant elephants elevator elevators eleven elevener elevens elf
elm elmer elms else elses emptied emptier empties emptiest empty emptying
encyclopedia encyclopedias end ended ender ending endless ends enemied
enemies enemy enemying engine engined engineer engineered engineering
engineers engines engining english englished englisher englishes englishing
enjoy enjoyed enjoyer enjoying enjoyment enjoyments enjoys enough enoughs
enter entered enterer entering enters envelope enveloped enveloper envelopes
enveloping equal equaled equaling equalled equaller equalling equals equator
equators erase erased eraser erases erasing errand errands escape escaped
escaper escapes escaping eskimo eskimoes eskimos evaporate evaporated
evaporates evaporating even evened evener evenest evening evenings evens ever
everest everlasting every everybody everyday everyone everything everywhere
everywheres evil eviler evilest eviller evils exactly example exampled
examples exampling excellent except excepted excepter excepting excepts
exchange exchanged exchanger exchanges exchanging excited exciting excuse
excused excuser excuses excusing exercise exercised exerciser exercises
exercising exit exited exiting exits expect expected expecter expecting
expects experiment experimented experimenter experimenting experiments
explain explained explainer explaining explains explode exploded exploder
explodes exploding express expressed expresser expresses expressing
expressway expressways extra extras eye eyeball eyeballed eyeballing eyeballs
eyebrow eyebrows eyed eyeglass eyeglasses eyeing eyelash eyelashes eyelid
eyelids eyer eyes eyesight eyesights eying fable fabled fabler fables fabling
face faced facer faces facing fact factories factoring factory facts fade
faded fader fades fading fail failed failing failles fails failure failures
faint fainted fainter faintest fainting faints fair faired fairer fairest
fairies fairing fairs fairy fairyland fairylands faith faithed faithing
faiths fake faked faker fakes faking fall faller falling falls false falser
falsest families family fan fancied fancier fancies fanciest fancy fancying
fand fanes fanned fanner fanning fans far far-off faraway fard fare fared
farer fares faring farm farmed farmer farmers farming farms farther fartherer
fashion fashioned fashioner fashioning fashions fast fasted fasten fastened
fastener fastening fastens faster fastest fasting fasts fat fated fates
father fathered fathering fathers fating fats fatted fatter fatting fault
faulted faulter faulting faults favor favored favorer favoring favorite
favorites favors favour favoured favourer favouring favourite favours fear
feared fearer fearing fears feast feasted feaster feasting feasts feather
feathered featherer feathering feathers februaries february fed feds feed
feeded feeder feeding feeds feel feeler feeling feels feet fell felled feller
fellest felling fellow fellowed fellowing fellows fells felt felted felter
felting felts female females fence fenced fencer fences fencing fern ferned
ferns festival festivals fever fevered fevering fevers few fewer fewest fib
fiber fibs fiddle fiddled fiddler fiddles fiddling field fielded fielder
fielding fields fifteen fifteener fifteens fifth fifths fifties fifty fig
figged figging fight fighter fighting fights figs figure figured figurer
figures figuring file filed filer files filing fill filled filler filles
filling fills film filmed filmer filming films final finales finally finals
find finder finding finds fine fined finer fines finest finger fingered
fingerer fingering fingernail fingernails fingerprint fingerprinted
fingerprinting fingerprints fingers fingertip fingertips fining finish
finished finisher finishes finishing fire fired fireflies firefly fireplace
fireplaces fireproof fireproofed fireproofing fireproofs firer fires
fireworks firing first firster firsts fish fished fisher fishes fishing fist
fisted fister fisting fists fit fits fitted fitter fitting five fiver fives
fix fixed fixer fixes fixing fizz fizzed fizzer fizzes fizzing flag flagged
flagger flagging flags flame flamed flamer flames flaming flap flapped
flapper flapping flaps flare flared flarer flares flaring flash flashed
flasher flashes flashing flashlight flashlights flat flated flats flatted
flatter flatting flavor flavored flavorer flavoring flavors flavour flavoured
flavourer flavouring flavours flea flear fleas flesh fleshed flesher fleshes
fleshing flew flewed flews flied flier flies fliest flight flighted flighter
flighting flights fling flip fliped fliping flipped flipper flipping flips
float floated floater floating floats flock flocked flocker flocking flocks
flood flooded flooder flooding floods floor floored floorer flooring floors
flour floured flouring flours flow flowed flower flowered flowerer flowering
flowers flowing flows flu flued fluer flues fluing flunk flunked flunker
flunking flunks flus flute fluted fluter flutes fluting fly flyer flying foam
foamed foamer foaming foams fog fogged fogger foggier foggiest fogging foggy
fogs fold folded folder folding folds folks follow followed follower
following follows fond fonded fonder fondest fonding fonds food fooder foods
fool fooled fooler fooling foolish foolisher foolishest fools foot football
footballer footballs footed footer footing footpath footpaths footprint
footprints foots footsteps for force forced forcer forces forcing ford
forehead foreheaded foreheads fores forest forested forester foresting
forests forever forevers forget forgetful forgets forgetter forgetting forgot
forgotten fork forked forker forking forks form formed former formes forming
forms fort fortes fortier forties forts fortune fortuned fortunes fortuning
forty forward forwarded forwarder forwardest forwarding forwards fought found
founded founder founding founds fountain fountained fountaining fountains
four fourer fours fourteen fourteener fourteens fourth fourther fourths fox
foxed foxer foxes foxing frame framed framer frames framing freckles free
freed freedom freedoms freeing freer frees freest freeze freezed freezer
freezes freezing freight freighted freighter freighting freights fresh
freshed fresher freshes freshest freshing friday fridays fried friend
friended friending friends friendship friendships frier fries frighten
frightened frightener frightening frightens frog frogged frogger frogging
frogs from front fronted fronter frontes fronting fronts frost frosted
froster frosting frosts frown frowned frowner frowning frowns froze fruit
fruited fruiter fruiting fruits fry fryer frying fudge fudged fudger fudges
fudging fuel fueled fueler fueling fuelled fueller fuelling fuels full fulled
fuller fullest fulling fulls fun fund funest funned funnier funnies funniest
funning funny funs fur furniture furnitures furred furring furs further
furthered furtherer furtherest furthering furthers gallon galloner gallons
gallop galloped galloper galloping gallops gamble gambled gambler gambles
gambling game gamed gamer games gamest gaming gang ganged ganger ganges
ganging gangs gangster gangsters garage garaged garages garaging garbage
garbages garden gardened gardener gardening gardens gargle gargled gargler
gargles gargling gas gases gasoline gasoliner gasolines gate gated gater
gates gather gathered gatherer gathering gathers gating gauge gauged gauger
gauges gauging gave gay gayer gayest gays geese general generals gentle
gentled gentleman gentlemen gentlemens gentler gentles gentlest gentling
geographies geography get gets getter getting ghost ghosted ghoster ghosting
ghosts giant giants gift gifted gifting gifts giggle giggled giggler giggles
giggling gill gilled giller gilling gills giraffe giraffes girl girling girls
give given givens giver gives giving glad glades gladness gladnesses glads
glance glanced glancer glances glancing glare glared glares glaring glass
glassed glasser glasses glassing glassware glasswares glide glided glider
glides gliding globe globed globes globing gloried glories glory glorying
glove gloved glover gloves gloving glow glowed glower glowing glows glue
glued glueing gluer glues gluing go goal goaled goaler goaling goals goat
goats gobble gobbled gobbler gobbles gobbling god godmother godmothers gods
goer goes going gold golden goldener goldenest golder goldest goldfish
goldfishes golding golds golf golfed golfer golfing golfs gone goner good
good-by good-bye gooder goodies gooding goodness goodnesses goods goose
goosed gooses goosing gor gos got goter gotten government governments
governor governors gown gowned gowning gowns grab grabs grace graced gracer
graces gracing grade graded grader grades grading grain grained grainer
graining grains grand grandchild granddaughter granddaughters grander
grandest grandfather grandfathers grandma grandmas grandmother grandmothers
grandpa grandpas grands grandson grandsons grandstand grandstanded
grandstander grandstanding grandstands grape graped grapefruit grapefruits
grapes graping grass grassed grasser grasses grasshopper grasshoppers
grassing grave graved gravel graveled graveling gravelled gravelling gravels
graver graves gravest graveyard graveyards gravies graving gravy gray grayed
grayer grayest graying grays graze grazed grazer grazes grazing grease
greased greaser greases greasier greasiest greasing greasy great greater
greatest greats greedier greediest greedy green greened greener greenest
greening greens greet greeted greeter greeting greets greing grew grey greyed
greyer greyest greyhound greyhounds greying greys grill grilled griller
grilles grilling grills grin grind grinded grinder grinding grinds grinned
grinner grinning grins grip griped griper gripes griping gripped gripper
grippes gripping grips grizzlier grizzlies grizzliest grizzling grizzly groan
groaned groaner groaning groans groceries grocery groom groomed groomer
grooming grooms ground grounded grounder grounding grounds group grouped
grouper grouping groups grow growed grower growing growl growled growler
growling growls grown grown-up grows growth growths guard guarded guarder
guarding guards guess guessed guesser guesses guessing guest guested guester
guesting guests guide guided guider guides guiding guitar guitars gum gummed
gummer gumming gums gun gunned gunner gunning guns guy guyed guyer guying
guys gym gyms habit habited habiting habits had haded hades hading hail
hailed hailer hailes hailing hails hair haired hairier hairiest hairs hairy
half halfer hall halling halloween halloweens halls hallway hallways ham
hamburger hamburgers hames hammed hammer hammered hammerer hammering hammers
hamming hams hamster hamsters hand handed hander handful handfuls handing
handkerchief handkerchiefs handle handled handler handles handling handmade
hands handsome handsomer handsomest handwriting handwritings hang hanged
hanger hanging hangs happen happened happening happens happier happiest
happiness happing happy harbor harbored harborer harboring harbors harbour
harboured harbourer harbouring harbours hard harder hardest harding hards
hardware hardwares harmful harmless harness harnessed harnesser harnesses
harnessing harp harped harper harping harps harvest harvested harvester
harvesting harvests has hat hatch hatched hatcher hatches hatchet hatchets
hatching hate hated hater hates hating hats hatted hatter hatting haul hauld
hauled hauler hauling hauls have haver haves having hawk hawked hawker
hawking hawks hay hayed hayer hayes haying hays he head headache headaches
headed header heading headline headlined headliner headlines headlining
headquarters heads heal heald healed healer healing heals health healthier
healthiest healths healthy heap heaped heaper heaping heaps hear heard hearer
hearing hears heart hearted hearting hearts heat heated heater heating heats
heaven heavens heavier heavies heaviest heaving heavy hed heel heeled heeler
heeling heels height heighted heights held helder helicopter helicopters hell
helled heller helling hello helloed helloes helloing hellos hells helmet
helmeted helmeting helmets help helped helper helpful helping helps hen hend
hennes hens her herd herded herder herding herds here heres hero heroes heros
herr herring hers herself hes hest hi-fi hid hidden hide hide-and-seek hided
hideout hideouts hider hides hiding high higher highest highs highway
highways hike hiked hiker hikes hiking hill hilled hiller hillier hilliest
hilling hills hilly him himming himself hing hint hinted hinter hinting hints
hip hiper hipped hipper hipping hippo hippos hips hire hired hirer hires
hiring his hiss historied historier histories history hit hitch hitched
hitcher hitches hitching hits hitter hitting hive hived hiver hives hiving ho
hobbies hobbing hobble hobbled hobbler hobbles hobbling hobby hockey hockeys
hod hoe hoed hoeing hoer hoes hold holder holding holds holdup holdups hole
holed holer holes holiday holidayed holidayer holidaying holidays holier
holies holiest holing hollow hollowed hollower hollowest hollowing hollows
holster holstered holsters holy home home-run homed homer homes homesick
homework homeworker homeworks homing honest honester honestest honey honeybee
honeybees honeyed honeying honeys honk honked honker honking honks honor
honored honorer honoring honors honour honoured honourer honouring honours
hood hooded hooding hoods hoof hoofed hoofer hoofing hoofs hook hooked hooker
hooking hooks hoot hooted hooter hooting hoots hop hope hoped hoper hopes
hoping hopped hopper hopping hops hopscotch hopscotcher hor horn horned
horner horning horns horse horsed horser horses horsing hose hosed hoses
hosing hospital hospitaler hospitaller hospitals hot hotel hotels hots hotted
hotter hotting hound hounded hounder hounding hounds hour hours house housed
housekeeper housekeepers houser houses housewife housing how howes howl
howled howler howling howls hows hug huge huger hugest hugged hugger hugging
hugs hum human humaner humanest humans hummed hummer humming hump humped
humping humps hums hundred hundreder hundreds hung hunger hungered hungerer
hungering hungers hungrier hungriest hungry hunk hunker hunks hunt hunted
hunter hunting hunts hurricane hurricanes hurried hurrier hurries hurry
hurrying hurt hurted hurter hurting hurts husband husbanded husbander
husbanding husbands hush hushed husher hushes hushing hut huts hutted hutting
hymn hymned hymner hymning hymns i ice ice-cream iceberg icebergs iced ices
icier iciest icing icy id idea ideaed ideas if ifs igloo igloos ill iller
illest illing ills imagine imagined imaginer imagines imagining important
impossible improve improved improver improves improving in inch inched incher
inches inchest inching ind indeed indian indians indoors industries industry
industrys ink inked inker inking inks inn inned inner innest inning inns ins
insect insected insects inside insider insides inspection inspections instead
intend intended intender intending intends interest interested interester
interesting interests into intoed introduce introduced introducer introduces
introducing invent invented inventer inventing inventor inventors invents
invite invited inviter invites inviting ir iron ironed ironer irones ironing
irons is ised ising island islanded islander islanding islands it itd iter
its ivied ivies ivoried ivories ivory ivy jack jack-o-lantern jacked jacker
jacket jacketed jacketing jackets jacking jackpot jackpots jacks jail jailed
jailer jailing jails jam james jammed jammer jamming jams janitor janitors
januaries january jar jarred jarring jars jaw jawbone jawboned jawboner
jawbones jawboning jawed jawing jaws jay jays jaywalker jaywalkers jazz
jazzed jazzer jazzes jazzing jeans jeep jeeped jeeping jeeps jellied jellies
jelling jelly jellying jerk jerked jerker jerking jerks jet jetes jets jetted
jetter jetting jewel jeweled jeweler jeweling jewelled jeweller jewellery
jewelling jewelries jewelry jewels jig jigged jigger jigging jigs job jobs
join joined joiner joining joins joke joked joker jokes joking jollied
jollier jollies jolliest jolly jollyer jollying journey journeyed journeyer
journeying journeys joy joyed joyful joyfuller joying joys judge judged
judger judges judging jug juger jugged jugger jugging jugs juice juiced
juicer juices juicier juiciest juicing juicy julies july jump jumped jumper
jumping jumps june jungle jungled jungles junk junked junker junking junks
just justed juster justest justing justs kangaroo kangarooer kangarooing
kangaroos keep keeper keeping keeps kept ketchup ketchups kettle kettler
kettles key keyed keyer keying keys kick kicked kicker kicking kicks kid
kidnap kidnaped kidnaper kidnaping kidnapped kidnapper kidnapping kidnaps
kids kill killed killer killing kills kind kinder kindergarten kindergartener
kindergartening kindergartens kindest kindness kindnesses kinds king kinged
kinging kings kiss kissed kisser kisses kissing kit kitchen kitchener
kitchens kite kited kiter kites kiting kits kitted kitten kittened kittening
kittens kitter kitties kitting kitty knee kneed kneeing kneel kneeled kneeler
kneeling kneels knees knew knife knifed knifer knifes knifing knight knighted
knighting knights knit knits knitted knitter knitting knives knob knobs knock
knocked knocker knocking knocks knot knots knotted knotter knotting know
knower knowing known knowns knows la lace laced lacer laces lacing lad ladder
laddered laddering ladders laded lader lades ladies lading lads lady laid
lake laked laker lakes laking lamb lambed lamber lambes lambing lambs lame
lamed lamer lames lamest laming lamp lamped lamper lamping lamps land landed
lander landing lands lane lanes language languaged languages languaging
lantern lanterned lanterning lanterns lap lapped lapper lapping laps lar
large larger larges largest las last lasted laster lasting lasts late lated
later latest laugh laughed laugher laughing laughs laundries laundry law
lawed lawing lawn lawned lawner lawns laws lawyer lawyered lawyering lawyers
lazied lazier lazies laziest lazing lazy lazying lazys lead leaded leader
leading leads leaf leafed leafer leafing leafs leak leaked leaker leaking
leaks lean leaned leaner leanest leaning leans leap leaped leaper leaping
leaps learn learned learner learning learns leather leathered leatherer
leathering leathers leave leaved leaver leaves leaving led leds left lefter
leftest lefts leg leger leges legged legger legging legs lemon lemonade
lemonades lemons lend lended lender lending lends length lengther lengths
lens lensed lenses lensing leopard leopards less lesser lesses lessest lesson
lessoned lessoning lessons let lets letted letter lettered letterer lettering
letters letting lettuce lettuces level leveled leveler leveling levelled
leveller levelling levels liar liard liars liberties liberty librarian
librarians libraries library lick licked licker licking licks lid lids lie
lied lier lies liest life lifeboat lifeboats lifeguard lifeguards lifer lift
lifted lifter lifting lifts light lighted lighter lightest lighthouse
lighthouses lighting lightness lightnesses lightning lightninged lightnings
lights like liked liker likes likest liking lilied lilies lily limb limbed
limber limbing limbs lime limed limer limes liming line lined linen linener
linens liner lines lining lion lions lip lipped lipper lipping lips lipstick
lipsticks liquor liquored liquorer liquoring liquors list listed listen
listened listener listening listens lister listing lists litterbug litterbugs
little littler littles littlest littling live lived liver livered livering
livers lives livest living lizard lizards ll load loaded loader loading loads
loaf loafed loafer loafing loafs loan loaned loaner loaning loans loaves
lobster lobstering lobsters lock locked locker locking locks log loges logged
logger logging logs lollipop lollipops london londoner lone loner lonesome
lonesomes long longed longer longes longest longing longs look looked looker
looking looks loop looped looper looping loops loose loosed looser looses
loosest loosing lord lorded lording lords lose loser loses losing loss losser
losses lost lot lotion lotions lots lotted lotter lotting loud louder loudest
loudspeaker loudspeakers love loved lover loves loving low lowed lower lowes
lowest lowing lows luck lucked luckier luckies luckiest lucking lucks lucky
luggage luggages lullabied lullabies lullaby lullabying lumber lumbered
lumberer lumbering lumbers lump lumped lumper lumping lumps lunch lunched
luncher lunches lunching lung lunged lunger lunges lunging lungs luxuries
luxury lying lyings m ma macaroni macaronies macaronis machine machined
machiner machines machining mad made mads maed maes magazine magazined
magaziner magazines magazining magic magics magnet magnets maid maids mail
mailed mailer mailes mailing mailman mails major majored majorette majorettes
majoring majors make make-believe maker makes making male males mama mamas
man manage managed manager managers manages managing mand mane maned manes
manned manner manners manning mans many map maple maples mapped mapper
mapping maps mar marble marbled marbler marbles marbling march marched
marcher marches marching mark marked marker market marketed marketer
marketing markets marking marks marriage marriages married marrier marries
marring marry marryer marrying marrys marvellous marvelous mas mash mashed
masher mashes mashing mask masked masker masking masks master mastered
masterer mastering masters match matched matcher matches matching mate mated
mater mates mating matter mattered mattering matters mattress mattresses may
maybe maybes mayed mayest maying mayor mayors mays me meadow meadowed
meadower meadowing meadows meal mealed mealer mealing meals mean meaned
meaner meanest meaning meanings means measure measured measurer measures
measuring meat meated meats med medicine medicined mediciner medicines
medicining meet meeter meeting meets melon melons melt melted melter melting
melts member membered members memoried memories memorise memorize memorized
memorizer memorizes memorizing memory men mend mended mender mending mends
mens mention mentioned mentioner mentioning mentions menu menus meow meowed
meowing meows mer merchant merchanted merchanter merchanting merchants
mermaid mermaids merrier merriest merry merry-go-round mess message messaged
messages messaging messed messenger messengers messer messes messing mest met
metal metaled metaler metaling metalled metaller metalling metals meted meter
metered metering meters metes meting mets mice microphone microphones
microphoning middle middled middler middles middling midget midgets midnight
midnights midsummer midsummers might mighted mightier mightiest mights mighty
mile miler miles milk milked milker milking milks milkshake mill milled
miller milles milling million millionaire millionaires millioned millioner
millions mills mind minded minder minding minds mine mined miner miners mines
ming mining minister ministered ministering ministers mink minkes minks
minnow minnows mint minted minter minting mints minute minuted minuter
minutes minutest minuting miracle miracled miracles miracling mirror mirrored
mirroring mirrors miseries misery mislay mislayer mislaying mislays misplace
misplaced misplaces misplacing misprint misprinted misprinting misprints miss
missed misses missile missiles missing misspell misspelled misspelling
misspells mist mistake mistaker mistakes mistaking misted mister mistered
mistering misters mistier mistiest misting mists misty mitt mitten mittened
mittens mitts mix mixed mixer mixes mixing mixture mixtures mob mobed mobs
model modeled modeler modeling modelled modeller modelling models modern
moderner modernest moderns moist moister moistest moisture moistures mom
moment moments momes mommer moms monday mondays money moneyed moneyer
moneying moneys monkey monkeyed monkeying monkeys monster monsters month
months moo mood mooed mooing moon mooned mooner mooning moonlight moonlighted
moonlighter moonlighting moonlights moons moor moos moose mop moped moper
mopes moping mopped mopper mopping mops more mores morning mornings most
mostest mosts motel motels moth mothed mother mothered motherer mothering
mothers moths motion motioned motioner motioning motions motocycle motor
motored motoring motors mountain mountained mountainer mountains mouse moused
mouser mouses mousing mouth mouthed mouther mouthes mouthing mouths movable
movables move moved mover moves movie movies moving mow mowed mower mowing
mows mr mrs much muches mud mudd muds muffin muffins mule muled mules muling
multiplication multiplications multiplied multiplier multiplies multiply
multiplying mumps murder murdered murderer murdering murders museum museums
mush mushed musher mushes mushing mushroom mushroomed mushroomer mushrooming
mushrooms music musical musicales musicals musician musicianer musicians
musics must mustard mustarder mustards musted muster musting musts my myself
mysteries mystery nail nailed nailer nailing nails name named namer names
naming nap napes napkin napkined napkining napkins napped napper nappes
napping naps narrow narrowed narrower narrowest narrowing narrows nastier
nasties nastiest nasty nation nations nature natured natures naturing
naughtier naughtiest naughty navies navy near nearby neared nearer nearest
nearing nears neat neater neatest neatness neatnesses neats necessaries
necessary neck necked necker necking necklace necklaced necklaces necks
necktie neckties need needed needer needing needle needled needler needles
needling needs negro negroes negros neighbor neighbored neighborer
neighborhood neighborhoods neighboring neighbors neighbour neighboured
neighbourer neighbourhood neighbouring neighbours neither nerve nerved nerver
nerves nerving nest nested nester nesting nests net neter nets netted netter
netting never new newborn newborns newcomer newcomers newer newest newing
news newscast newscaster newscasting newscasts newspaper newspapers next
nibble nibbled nibbler nibbles nibbling nice nicer nicest nickel nickeled
nickeling nickelled nickelling nickels nickname nicknamed nicknamer nicknames
nicknaming night nighted nighter nightfall nightfalls nighting nightmare
nightmares nights nighttime nighttimes nine nines nineteen nineteens nineties
ninety ninth ninths nipple nippled nipples nippling no nobodies nobody
nobodyd nod noded nodes nods noes noise noised noises noisier noisiest
noising noisy none nones noodle noodled noodles noodling noon nooned nooning
noons nor normal normals north norther northern northerner northerns northest
northing norths nos nose nosed noser noses nosing not note noted noter notes
nothing nothings notice noticed noticer notices noticing noting nots november
novembers now nowed nowhere nowheres nows number numbered numberer numbering
numbers nurse nursed nurser nurseries nursery nurses nursing nut nuts nutted
nutter nutting o oak oaks oar oared oaring oars oatmeal oatmeals oats obey
obeyed obeyer obeying obeys ocean oceaned oceans october octobers octopus
octopuses odd odder oddest odds of off offed offer offered offerer offering
offers office officer offices offing offs often oftener oftenest oftens oh
ohed ohing ohs oil oiled oiler oiling oils ok okay okayed okaying okays oker
okes old older oldest olds on once oncer onces one one-fourth one-way oner
ones oneself onion onions onliest only ons onward onwards open opened opener
openest opening opens operator operators opossum opossums or orange oranger
oranges orbit orbited orbiter orbiting orbits orchard orcharding orchards ord
order ordered orderer ordering orders ordinarier ordinaries ordinariest
ordinary ored ores organ organer organing organs orphan orphaned orphaning
orphans ors ostrich ostriches other otherest others ouch ouched ouches
ouching ought oughted oughting oughts ounce ounces our ours ourselves out
outdoors outed outer outers outing outlaw outlawed outlawing outlaws outline
outlined outliner outlines outlining outr outs outside outsided outsider
outsides oven ovened ovening ovens over overalls overboard overcoat
overcoated overcoating overcoats overdo overdoer overdoes overdoing overdone
overeat overeater overeating overeats overed overest overflow overflowed
overflower overflowing overflows overhead overheads overing overnight
overnighter overs overseas overtime overtimed overtimer overtimes overtiming
overweight overweighted overweighting owe owed ower owes owing owl owler
owling owls own owned owner owning owns pa pack package packaged packager
packages packaging packed packer packing packs pad pads page paged pager
pages paging paid pail pailles pails pain pained painful painfuller paining
pains paint painted painter painting paints pair paired pairer pairing pairs
pajamas pal palace palaced palaces pale paled paler pales palest paling
palled palling pals pan pancake pancaked pancakes pancaking pand panda pandar
pandas paned panes panned panner pannes panning pans pants papa papas paper
papered paperer papering papers par parade paraded parader parades parading
pardon pardoned pardoner pardoning pardons parent parented parenting parents
park parked parker parking parks parrot parroted parroter parroting parrots
part parted parter partes partied partier parties parting partner partnered
partnering partners partnership partnerships parts party partyer partying pas
pass passed passenger passengers passer passes passing password passwords
past paste pasted paster pastes pasting pasts pasture pastured pasturer
pastures pasturing pat patch patched patcher patches patching patd pated
pater pates path pathed paths pats patted patter patting pave paved paver
paves paving paw pawed pawer pawing paws pay payed payer paying payment
payments pays pea peace peaced peaceful peacefuller peaces peach peached
peacher peaches peaching peacing peacock peacocked peacocking peacocks peak
peaked peaker peaking peaks peanut peanuts pear pearl pearled pearler
pearling pearls pears peas pecan pecans peck pecked pecker pecking pecks peek
peeked peeking peeks peel peeled peeler peeling peels peep peeped peeper
peeping peeps peg pegged pegger pegging pegs pen pencil penciled penciler
penciling pencilled penciller pencilling pencils pend penes penest penguin
penguins penned penner pennied pennies penning penny pens people peopled
peopler peoples peopling pep pepped pepper peppered pepperer peppering
peppermint peppermints peppers peppier peppiest pepping peppy peps perfume
perfumed perfumer perfumes perfuming perhaps perhapses period periods permit
permits permitted permitter permitting person personal personals personed
persons pest pester pests pet peter pets petted petter petting phone phoned
phoner phones phoning phonograph phonographer phonographs photo photoed
photograph photographed photographer photographing photographs photoing
photos piano pianos pick picked picker picking pickle pickled pickler pickles
pickling picks picnic picnics picture pictured picturer pictures picturing
pie piece pieced piecer pieces piecing pied pieing pier pies piest pig pigeon
pigeoner pigeons pigged pigging pigs piing pile piled piler piles pilgrim
pilgrimer pilgrims piling pill pilled piller pilling pillow pillowed
pillowing pillows pills pilot piloted piloting pilots pimple pimpled pimples
pimpling pin pind pine pineapple pineapples pined piner pines ping-pong
pingpong pining pink pinked pinker pinkest pinking pinks pinned pinner
pinning pins pint pints pioneer pioneered pioneering pioneers pipe piped
piper pipes piping pistol pistoled pistoles pistoling pistolled pistolling
pistols pit pitch pitched pitcher pitchered pitchers pitches pitching pitied
pitier pities pitiful pitifuller pits pitted pitter pitting pity pitying
pizza pizzas place placed placer places placing plain plained plainer
plainest plaining plains plan plane planed planer planes planet planeted
planeting planets planing planned planner planning plans plant plantation
plantations planted planter planting plants plaster plastered plasterer
plastering plasters plate plated plater plates plating play played player
playful playground playgrounds playhouse playhouses playing playmate
playmates plays plaything playthings pleasant pleasanter pleasantest please
pleased pleaser pleases pleasing pleasure pleasured pleasurer pleasures
pleasuring plenties plenty plow plowed plower plowing plows plug plugged
plugger plugging plugs plum plumber plumbers plumed plumer plumes pluming
plummer plumming plums plus pluses pm pocket pocketbook pocketbooks pocketed
pocketer pocketing pockets poem poems point pointed pointer pointes pointing
points poison poisoned poisoner poisoning poisons poke poked poker pokes
poking pole poled poler poles police policed policeman polices policing
poling polite politer politest pond ponded ponder ponding ponds ponied ponier
ponies pony ponying poodle poodler poodles pool pooled pooler pooling pools
poor poorer poorest pop popcorn popcorns popes popped popper poppied poppies
popping poppy pops porch porched porches porching pork porker porks pose
posed poser poses posing possible possibler possibles possiblest post postage
postages posted poster posting postman postmark postmarked postmarking
postmarks postpone postponed postponer postpones postponing posts pot potato
potatoes potator poter pots potted potter potteries pottering pottery potting
pound pounded pounder pounding pounds pour poured pourer pouring pours powder
powdered powderer powdering powders power powered powerful powering powers
prairie prairied prairies praise praised praiser praises praising pray prayed
prayer prayers praying prays prepare prepared preparer prepares preparing
present presented presenter presenting presents president presidentes
presidents press pressed presser presses pressing pretend pretended pretender
pretending pretends prettied prettier pretties prettiest pretty prettying
prevent prevented preventer preventing prevents price priced pricer prices
pricing primaried primaries primary prince princes princess princesses print
printed printer printing prints prison prisoned prisoner prisoning prisons
private privater privates privatest prize prized prizer prizes prizing
problem problems program programed programer programing programmed programmer
programmes programming programs promise promised promiser promises promising
proof proofed proofer proofing proofs propertied properties property protect
protected protecting protects proud prouder proudest prove proved prover
proves proving prune pruned pruner prunes pruning public publics puddle
puddled puddler puddles puddling puff puffed puffer puffing puffs pull pulled
puller pulling pulls pump pumped pumper pumping pumpkin pumpkins pumps punch
punched puncher punches punching punish punished punisher punishes punishing
pup pupil pupiled pupilled pupils pupped puppet puppets puppied puppies
pupping puppy puppying pups pure pured purer purest purple purpled purpler
purples purplest purpling purse pursed purser purses pursing push pushed
pusher pushes pushing puss pusses pussier pussies pussiest pussy put puting
puts putted putter putting puzzle puzzled puzzler puzzles puzzling pyjamas
quack quacked quacking quacks quarrel quarreled quarreler quarreling
quarrelled quarreller quarrelling quarrels quart quarter quarterback
quarterbacked quarterbacking quarterbacks quartered quarterer quartering
quarters quartes quarts queen queened queening queens queer queered queerer
queerest queering queers question questioned questioner questioning questions
quick quicked quicker quickest quicking quickly quicks quiet quieted quieter
quietest quieting quiets quilt quilted quilter quilting quilts quit quite
quiting quits quitted quitter quitting rabbit rabbited rabbiter rabbiting
rabbits raccoon raccoons race raced racer races racing rack racked racker
racking racks radio radioed radioing radios radish radishes rag raged rager
rages ragged ragger ragging raging rags rail railed railer railing railroad
railroaded railroader railroading railroads rails rain rainbow rainbows
raindrop raindrops rained rainer raines rainier rainiest raining rains rainy
raise raised raiser raises raising rake raked raker rakes raking ram ramed
rammed rammer ramming rams ran ranch ranched rancher ranches ranching rand
rang range ranged ranger ranges ranging rap raped raper rapes raping rapped
rapper rapping raps rascal rascals rat rate rated rater rates rather
ratherest rating rats ratted ratter ratting rattle rattled rattler rattles
rattlesnake rattlesnakes rattling raw rawer rawest rawing raws ray rayed
raying rayon rayons rays razor razored razoring razors re reach reached
reacher reaches reaching read readd reader readied readier readies readiest
reading reads ready readying real realer reales realest really reals rear
reared rearer rearing rears reason reasoned reasoner reasoning reasons
rebuild rebuilded rebuilder rebuilding rebuilds receive received receiver
receives receiving recess recessed recesser recesses recessing record
recorded recorder recording records red redbird redbirds redbreast redbreasts
redd reded redes reding reds reflect reflected reflecter reflecting reflects
refresh refreshed refresher refreshes refreshing refreshment refreshments
refrigerator refrigerators refuse refused refuser refuses refusing reindeer
reindeers rejoice rejoiced rejoicer rejoices rejoicing rejoin rejoined
rejoining rejoins related religion religioner religions remain remained
remainer remaining remains remember remembered rememberer remembering
remembers remind reminded reminder reminding reminds remove removed remover
removes removing rent rented renter rentes renting rents repair repaired
repairer repairing repairs repay repayed repaying repays repeat repeated
repeater repeating repeats report reported reporter reporting reports respect
respected respecter respecting respects rest restaurant restaurants rested
rester restes resting restr rests retire retired retirer retires retiring
return returned returner returning returns review reviewed reviewer reviewing
reviews reward rewarded rewarder rewarding rewards rhyme rhymed rhymer rhymes
rhyming rib ribbon ribboned ribboner ribboning ribbons ribes ribs rice riced
ricer rices rich richer riches richest ricing ride rider rides riding right
righted righter rightest righting rights rim rimed rimer rimes riming rimmed
rimmer rimming rims ring ringed ringer ringing rings rip ripe riped riper
ripes ripest riping ripped ripper ripping rips rise riser rises rising river
rivered rivers road roaded roader roading roads roar roared roarer roaring
roars roast roasted roaster roasting roasts rob robber robberies robbers
robbery robe robed rober robes robin robing robins robs rock rocked rocker
rocket rocketed rocketer rocketing rockets rockier rockies rockiest rocking
rocks rocky rode roding roll rolled roller rolling rolls romance romanced
romancer romances romancing roof roofed roofer roofing roofs room roomed
roomer rooming rooms rooster roosters root rooted rooter rooting roots rope
roped roper ropes roping rose rosed roser roses rosing rot roter rotes rots
rotted rotten rottener rottenest rotter rottes rotting rough roughed rougher
roughest roughing roughs round rounded rounder roundest rounding rounds route
routed router routes routing row rowboat rowboats rowed rower rowing rows
royal royals rub rubber rubbered rubberer rubbers rubes rubs rug rugged
rugger rugging rugs rule ruled ruler rules ruling run runed runer runes rung
rungs runner running runs rush rushed rusher rushes rushing rust rusted
rustier rustiest rusting rusts rusty s sack sacked sacker sacking sacks sad
saddle saddled saddler saddles saddling sades sadness sadnesses sadr safe
safer safes safest safetied safeties safety safetying said saids sail
sailboat sailboater sailboating sailboats sailed sailer sailing sailor
sailoring sailors sails saint sainted sainting saints salad salading salads
sale sales salt salted salter saltest salting salts same sample sampled
sampler samples sampling sand sanded sander sandier sandies sandiest sanding
sands sandwich sandwiched sandwiches sandwiching sandy sang sanger sank sap
sapped sapper sapping saps sat satd sated sates sating satisfactory saturday
saturdays sauce sauced saucer saucers sauces saucing sausage sausages save
saved saver saves saving savings saw sawdust sawdusts sawed sawer sawing saws
say sayer sayest saying says scab scabs scale scaled scaler scales scaling
scalp scalped scalper scalping scalps scamper scampered scamperer scampering
scampers scare scarecrow scarecrows scared scarer scares scarf scarfed
scarfer scarfing scarfs scarier scariest scaring scary scatter scattered
scatterer scattering scatters school schoolboy schoolboys schooled schooler
schoolgirl schoolgirls schooling schools science scienced sciences scissors
scoop scooped scooper scooping scoops scooter scooters score scored scorer
scores scoring scout scouted scouter scouting scouts scrap scraped scraper
scrapes scraping scrapped scrapper scrapping scraps scratch scratched
scratcher scratches scratching scream screamed screamer screaming screams
screen screened screener screening screens screw screwed screwer screwing
screws scrub scrubs sea seal sealed sealer sealing seals seam seamed seamer
seaming seams sear search searched searcher searches searching seas seashore
seashores season seasoned seasoner seasoning seasons seat seated seater
seating seats second seconded seconder secondes seconding seconds secret
secreted secreter secretes secretest secreting secrets see seed seeded seeder
seeding seeds seeing seem seemed seemer seeming seems seen seer sees seesaw
seesawed seesawing seesaws selection selections self selfed selfing selfish
selfs sell seller selles selling sells selves send sended sender sending
sends sense sensed senses sensible sensibler sensibles sensiblest sensing
sent sentence sentenced sentencer sentences sentencing sents separate
separated separates separating september servant servants serve served server
serves service serviced servicer services servicing serving set sets setter
setting settle settled settler settles settling seven sevener sevens
seventeen seventeens seventh sevenths seventies seventy several severals sew
sewed sewer sewing sews shade shaded shader shades shadier shadiest shading
shadow shadowed shadower shadowing shadows shady shake shaker shakes shaking
shall shame shamed shamer shames shaming shampoo shampooed shampooer
shampooing shampoos shape shaped shaper shapes shaping share shared sharer
shares sharing sharp sharped sharper sharpest sharping sharps shave shaved
shaver shaves shaving she shed sheep sheet sheeted sheeter sheeting sheets
shelf shell shelled sheller shelling shells shelves shepherd shepherded
shepherding shepherds sher shes shied shier shies shiest shine shined shiner
shines shinier shiniest shining shiny ship shipment shipments shipped shipper
shipping ships shirt shirting shirts shock shocked shocker shocking shocks
shoe shoed shoeing shoemaker shoemakers shoer shoes shook shooks shoot
shooter shooting shoots shop shopped shopper shoppes shopping shops shore
shored shorer shores shoring short shorted shorter shortest shorting
shortness shortnesses shorts shot shotes shots shotted shotter shotting
should shoulder shouldered shoulderer shouldering shoulders shouldest shout
shouted shouter shouting shouts shove shoved shovel shoveled shoveler
shoveling shovelled shoveller shovelling shovels shover shoves shoving show
showd showed shower showered showerer showering showers showing shown shows
shut shuted shutes shuting shuts shutter shuttered shuttering shutters
shutting shy shyer shyest shying sick sicked sicker sickest sicking sickness
sicknesses sicks side sided sider sides sidest sidewalk sidewalks siding sigh
sighed sigher sighing sighs sight sighted sighter sighting sights sign signed
signer signing signs silence silenced silencer silences silencing silent
silenter silentest silents silk silked silker silking silks sill siller
sillier sillies silliest sills silly silver silvered silverer silvering
silvers simple simpled simpler simples simplest simpling sin since sind sines
sing singed singer singes singing single singled singler singles singling
sings sink sinked sinker sinking sinks sinned sinner sinning sins sip siped
siper sipes siping sipped sipper sipping sips sir sired sires siring sirs sis
sises siss sister sistered sistering sisters sit sited sites siting sits
sitter sitting six sixer sixes sixing sixteen sixteener sixteens sixth sixths
sixties sixty size sized sizer sizes sizing skate skated skater skates
skating ski skid skied skier skies skiing skin skinned skinner skinning skins
skip skipped skipper skipping skips skirt skirted skirter skirting skirts
skis skunk skunked skunking skunks sky skyed skying skys skyscraper
skyscrapers slam slammed slammer slamming slams slap slapped slapper slapping
slaps slave slaved slaver slaves slaving sled sleds sleep sleeper sleepier
sleepiest sleeping sleeps sleepy sleeve sleeved sleever sleeves sleeving
sleigh sleighed sleigher sleighing sleighs slept slice sliced slicer slices
slicing slid slide slided slider slides sliding slier sliest slim slimed
slimer slimes sliming slimmed slimmer slimming slims sling slip sliped slipes
sliping slipped slipper slippered slipperier slipperiest slippers slippery
slipping slips slosh sloshed slosher sloshes sloshing slow slowed slower
slowest slowing slowly slows sly slyer slyest small smaller smallest smalling
smalls smart smarted smarter smartest smarting smarts smash smashed smasher
smashes smashing smell smelled smeller smelling smells smile smiled smiler
smiles smiling smog smogs smoke smoked smoker smokes smokey smoking smooth
smoothed smoother smoothes smoothest smoothing smooths snack snacked snacking
snacks snail snailed snailing snails snake snaked snaker snakes snaking snap
snaper snapped snapper snapping snaps sneeze sneezed sneezer sneezes sneezing
sniff sniffed sniffer sniffing sniffs snow snowball snowballed snowballing
snowballs snowed snowflake snowflakes snowier snowiest snowing snows snowy
snug snugged snugger snugging snugs so soak soaked soaker soaking soaks soap
soaped soaper soaping soaps social socials sock socked socker socking socks
sod soda sodas sofa sofar sofas soft softball softballs softer softest softs
soil soiled soiling soils sold solder soldier soldiered soldiering soldiers
solid solider solidest solids solve solved solver solves solving some
somebodies somebody someone someones something sometime sometimes somewhere
somewheres son sond sones song songer songs soning sons soon sooner soonest
sore sorer sores sorest soring sorrier sorriest sorrow sorrowed sorrower
sorrowing sorrows sorry sort sorted sorter sortes sorting sorts sos soul
souled souls sound sounded sounder soundest sounding sounds soup souped
souper souping soups sour sourd soured sourer sourest souring sours south
southed souther southern southerner southernest southerns southing souths
space spaced spacer spaces spaceship spaceships spacing spade spaded spader
spades spading spaghetti spaghettis spank spanked spanker spanking spanks
spark sparked sparker sparking sparks sparrow sparrows speak speaker speaking
speaks spear speared spearer spearing spears special specialer specialest
specials speck specked specking specks speech speecher speeches speeching
speed speeded speeder speeding speedometer speedometers speeds spell spelled
speller spelling spells spend spender spending spends spent spice spiced
spicer spices spicing spider spidered spiders spied spier spies spill spilled
spiller spilling spills spin spined spines spinner spinning spins spirit
spirited spiriter spiriting spirits spit spited spites spiting spits spitted
spitter spitting splash splashed splasher splashes splashing splashs split
splits splitted splitter splitting spoil spoiled spoiler spoiling spoils
spoke spoked spokes spoking sponge sponged sponger sponges sponging spook
spooked spookier spookies spookiest spooking spooks spooky spool spooled
spooler spooling spools spoon spooned spooner spooning spoons sport sported
sporter sporting sports spot spots spotted spotter spotting sprain sprained
spraing spraining sprains spray sprayed sprayer spraying sprays spread
spreaded spreader spreading spreads spring springed springer springes
springing springs sprinkle sprinkled sprinkler sprinkles sprinkling spy spyer
spying square squared squarer squares squarest squaring squash squashed
squasher squashes squashing squashs squeak squeaked squeaker squeakier
squeakiest squeaking squeaks squeaky squeal squeald squealed squealer
squealing squeals squeeze squeezed squeezer squeezes squeezing squirrel
squirreled squirreling squirrelled squirrelling squirrels stab stable stabled
stabler stables stablest stabling stabs stack stacked stacker stacking stacks
stage staged stager stages staging stair staired stairs stale staled staler
stales stalest staling stalk stalked stalker stalking stalks stamp stamped
stamper stamping stamps stand stander standing stands star starch starched
starcher starches starching stare stared starer stares staring starr starred
starring stars start started starter starting starts starve starved starver
starves starving state stated stater states stating station stationed
stationer stationing stations statue statued statues statuing stay stayed
stayer staying stays steak steaks steal stealed stealer stealing steals steam
steamed steamer steaming steams steel steeled steeler steeling steels steep
steeped steeper steepest steeping steeple steepled steeples steeps steer
steered steerer steering steers step stepfather stepfathers stepmother
stepmothers stepped stepper steppes stepping steps stereo stereoed stereoing
stereos stew stewed stewing stews stick sticked sticker stickier stickiest
sticking sticks sticky stiff stiffed stiffer stiffest stiffing stiffs still
stilled stiller stillest stilling stills sting stinger stinging stings stink
stinker stinking stinks stir stirred stirrer stirring stirs stitch stitched
stitcher stitches stitching stock stocked stocker stocking stockinged
stockinger stockinging stockings stocks stole stoled stolen stoles stomach
stomached stomacher stomaches stomaching stomachs stone stoned stoner stones
stoning stood stooded stool stooled stooling stools stoop stooped stooper
stooping stoops stop stoped stoper stopes stoping stoplight stoplights
stopped stopper stopping stops store stored storer storeroom storerooms
stores storied storier stories storing stork storks storm stormed stormer
stormier stormiest storming storms stormy story storying storyteller
storytellers stove stoved stover stoves stoving straight straighted
straighten straightened straightener straightening straightens straighter
straightest straighting straights strange stranger strangest strap strapped
strapper strapping straps straw strawberries strawberry strawed strawer
strawing straws stream streamed streamer streaming streams street streets
strength strengthed strengths stretch stretched stretcher stretches
stretching strike striked striker strikes striking string stringed stringer
stringing strings strip stripe striped striper stripes striping stripped
stripper stripping strips strong stronger strongest struck student students
studied studier studies studio studios study studying studys stuff stuffed
stuffer stuffing stuffs stumble stumbled stumbler stumbles stumbling stung
stunt stunted stunter stunting stunts style styled styler styles styling
subject subjected subjecting subjects submarine submarined submariner
submarines submarining subtract subtracted subtracter subtracting subtraction
subtractions subtracts such suck sucked sucker sucking sucks sudden suddenly
suddens suffer suffered sufferer suffering suffers sugar sugared sugarer
sugaring sugars suit suited suiter suites suiting suits sum summed summer
summered summerer summering summers summing sums sun sunbeam sunbeamed
sunbeams sunburn sunburned sunburning sunburns sunday sundays sundown
sundowner sundowning sundowns sunflower sunflowers sung sunk sunken sunned
sunnier sunniest sunning sunny sunrise sunrises sunrising suns sunset sunsets
sunsetting sunshine sunshines sunshining supper suppering suppers suppose
supposed supposer supposes supposing sure sured surer sures surest surface
surfaced surfacer surfaces surfacing surfboard surfboarder surfboarding
surfboards surgeon surgeons surprise surprised surpriser surprises surprising
surround surrounded surrounder surrounding surroundings surrounds suspect
suspected suspecter suspecting suspects swallow swallowed swallower
swallowing swallows swam swamp swamped swamper swamping swamps swan swanned
swanner swanning swans swear swearer swearing swears sweat sweated sweater
sweaters sweating sweats sweep sweeper sweeping sweeps sweepstakes sweet
sweeten sweetened sweetener sweetening sweetens sweeter sweetest sweetheart
sweethearted sweethearting sweethearts sweeting sweetness sweetnesses sweets
swell swelled sweller swellest swelling swells swept swift swifter swiftest
swifts swim swimmer swimming swims swing swinged swinger swinges swinging
swings switch switched switcher switches switching sword sworded sworder
swording swords syllable syllabled syllables syllabling t table tabled tabler
tables tablespoon tablespoons tablet tableted tableting tablets tabletted
tabletting tabling tack tacked tacker tacking tacks taffies taffy tag tagged
tagger tagging tags tail tailed tailer tailing tailles tailor tailored
tailoring tailors tails take taked takeing taken taker takes taking tale
taled taler tales talk talked talker talking talks tall taller talles tallest
tame tamed tamer tames tamest taming tan tangle tangled tangler tangles
tangling tank tanked tanker tanking tanks tanned tanner tanning tans tap tape
taped taper tapes taping tapped tapper tapping taps tar tared tares taring
tarr tarred tarrer tarres tarring tars taste tasted taster tastes tasting
tattle tattled tattler tattles tattletale tattletales tattling tattoo
tattooed tattooer tattooing tattoos taught tax taxed taxer taxes taxing
taxpayer taxpayers tea teach teached teacher teachers teaches teaching tead
teaer teaing team teamed teamer teaming teams teapot teapots tear teared
tearer tearing tears teas tease teased teaser teases teasing teaspoon
teaspoons teeth teethed teether teethes teething telegram telegrammed
telegramming telegrams telephone telephoned telephoner telephones telephoning
telescope telescoped telescopes telescoping television televisions tell
teller telling tells temper temperature temperatures tempered temperer
tempering tempers ten tend tended tender tendered tenderer tenderest
tendering tenders tending tends tenner tennis tennises tens tent tented
tenter tenth tenths tenting tents term termed termer termes terming terms
terrible terribles test tested tester testes testing tests than thanes thank
thanked thanker thankful thankfuller thanking thanks thanksgiving
thanksgivings that thatd thats the theatre theatres thed their theirs them
themed themer themes theming then thens there thered theres thermometer
thermometers these theses they theyd thick thicker thickest thicks thief thin
thing things think thinker thinking thinks thinned thinner thinning thins
third thirds thirst thirsted thirster thirstier thirstiest thirsting thirsts
thirsty thirteen thirteener thirteens thirties thirty this thorn thorned
thorning thorns those thought thoughted thoughtful thoughtless thoughts
thousand thousands thread threaded threader threading threads three threes
threw throat throated throating throats throne throned thrones throning
through throw thrower throwing thrown throws thumb thumbed thumber thumbing
thumbs thunder thundered thunderer thundering thunders thursday thursdays
tick tick-tock ticked ticker ticket ticketed ticketer ticketing tickets
ticking tickle tickled tickler tickles tickling ticks tiddlywinks tie tied
tieing tier ties tiger tigers tight tighter tightest tights till tilled
tiller tilling tills timber timbered timberer timbering timbers time timed
timer times timing tin tind tined tines tinier tiniest tining tinkle tinkled
tinkler tinkles tinkling tinned tinner tinning tins tiny tip tipped tipper
tipping tips tiptoe tiptoed tiptoeing tiptoes tiptoing tire tired tirer tires
tiring tissue tissued tissues tissuing title titled titler titles titling to
toad toader toads toast toasted toaster toasting toasts tobacco tobaccoes
tobaccos tod today todays toe toed toeing toes together togethers toilet
toileted toileting toilets toiletted toilettes told tomato tomatoes tomorrow
tomorrower tomorrowing tomorrows ton tone toned toner tones tongue tongued
tonguer tongues tonguing tonight tonights toning tonner tonnes tons too took
tool tooled tooler tooling tools tooth toothbrush toothbrushes toothbrushing
toothed toother toothing toothpaste toothpastes tooths top toped toper topes
toping topped topper topping tops tor tore tored tores torn tornado tornadoes
tornados torpedo torpedoed torpedoer torpedoes torpedoing torpedos tortoise
tortoises tos toss tossed tosser tosses tossing total totaled totaling
totalled totaller totalling totals touch touched toucher touches touching
toward towards towel toweled toweling towelled towelling towels town towned
towner towns toy toyed toyer toying toys trace traced tracer traces tracing
track tracked tracker tracking tracks tractor tractors trade traded trader
trades trading traffic traffics trail trailed trailer trailing trails train
trained trainer training trains tramp tramped tramper tramping tramps trap
trapes trapped trapper trapping traps trash trashed trashes trashing travel
traveled traveler traveling travelled traveller travelling travels tray trays
treasure treasured treasurer treasures treasuring tree treed treeing trees
trespass trespassed trespasser trespasses trespassing trick tricked tricker
tricking tricks tricycle tricycled tricycler tricycles tricycling tried trier
tries trim trimer trimmed trimmer trimming trims trip tripes tripped tripper
tripping trips trombone trombones troop trooped trooper trooping troops
trophied trophies trophy trophying trouble troubled troubler troubles
troubling truck trucked trucker trucking trucks true trued trueing truer
trues truest truing truly trumpet trumpeted trumpeter trumpeting trumpets
trunk trunked trunking trunks trust trusted truster trusting trusts truth
truthful truths try trying tub tube tubed tuber tubes tubing tubs tuesday
tuesdays tug tugged tugger tugging tugs tulip tulips tumble tumbled tumbler
tumbles tumbling tune tuned tuner tunes tuning tunnel tunneled tunneler
tunneling tunnelled tunneller tunnelling tunnels turkey turkeys turn turned
turner turning turnip turnips turns turtle turtled turtler turtles turtling
tv twelve twelves twenties twenty twice twicer twig twigged twigger twigging
twigs twin twined twiner twines twining twinned twinner twinning twins twist
twisted twister twisting twists two twoes twos type typed typer types
typewriter typewriters typing uglier uglies ugliest ugly umbrella umbrellaed
umbrellaing umbrellas umpire umpired umpirer umpires umpiring uncle uncles
uncling under underer underline underlined underliner underlines underlining
underring undershirt undershirts understand understanded understander
understanding understands underwear underwears undress undressed undresses
undressing uneducated unemployed unfair unfairer unfairest unfasten
unfastened unfastener unfastening unfastens unfinished unfold unfolded
unfolder unfolding unfolds unfurnished unhappier unhappiest unhappy uniform
uniformed uniformer uniformest uniforming uniforms unkind unkinder unkindest
unknown unknowns unnecessaries unnecessary unsafe unsafer unsafest untie
untied untieing unties untiing until untiled untilled untilling untrue
untruer untruest unwilling unwise unwiser unwisest unwrap unwrapped unwrapper
unwrapping unwraps up upon upped upper upperer upperest uppers upping ups
upset upsets upsetted upsetter upsetting upstairs uptown uptowner uptowns
upward upwards us usa usar use used useful user uses usher ushered usherer
ushering ushers using vacant vacation vacationed vacationer vacationing
vacations valentine valentines valley valleys valuable valuables value valued
valuer values valuing vanish vanished vanisher vanishes vanishing varnish
varnished varnisher varnishes varnishing vase vases ve vegetable vegetables
velvet velveted velveting velvets verier veriest verse versed verser verses
versing very vessel vesseled vesselled vessels vest vested vester vesting
vests vice-president view viewed viewer viewing views village villager
villages vine vined viner vines vining violet violets violin violined
violining violins visit visited visiter visiting visitor visitors visits
vitamin vitamines vitamins voice voiced voicer voices voicing volleyball
volleyballs vote voted voter votes voting waffle waffled waffles waffling wag
waged wager wages wagged wagger wagging waging wagon wagoned wagoner wagoning
wagons wags waist waisted waister waisting waists wait waited waiter waiting
waits wake waked waken wakened wakener wakening wakens waker wakes waking
walk walked walker walking walks wall walled waller wallet wallets walling
walls walnut walnuts wander wandered wanderer wandering wanders want wanted
wanter wanting wants war ward wared warer wares waring warm warmed warmer
warmest warming warms warmth warmths warn warned warner warning warns warred
warrer warring wars wart warted warts was wash washed washer washers washes
washing washroom washrooms wasp wasps waste wasted waster wastes wasting
watch watchdog watchdogged watchdogging watchdogs watched watcher watches
watching water watered waterer waterfall waterfalls watering watermelon
watermelons waterproof waterproofed waterproofer waterproofing waterproofs
waters wave waved waver waves waving wax waxed waxer waxes waxing way waying
ways we weak weaken weakened weakener weakening weakens weaker weakest
weakness weaknesses wealth wealths weapon weaponed weaponing weapons wear
weared wearer wearing wears weather weathered weatherer weathering weathers
weave weaved weaver weaves weaving web weber webs wed wedding weddinger
weddings wednesday wednesdays wee weed weeded weeder weeding weeds week
weekdays weekend weekended weekender weekending weekends weeks weep weeped
weeper weeping weeps weer wees weest weigh weighed weigher weighing weighs
weight weighted weighter weighting weights welcome welcomed welcomer welcomes
welcoming well welled weller welling wells went wer were wering west wester
western westerner westerns westing wests wet wets wetted wetter wetting whale
whaled whaler whales whaling what whatd whats wheat wheats wheel wheelbarrow
wheelbarrower wheelbarrows wheeled wheeler wheeling wheels when whens where
whered wheres which while whiled whiles whiling whing whip whipped whipper
whipping whips whirl whirled whirler whirling whirlpool whirlpools whirls
whirlwind whirlwinds whisker whiskered whiskerer whiskers whisper whispered
whisperer whispering whispers whistle whistled whistler whistles whistling
white whited whiteness whitenesses whiter whites whitest whiting who whod
whole wholes whom whose why whys wicked wickeder wickedest wide wide-awake
wider wides widest wife wifed wifes wifing wigwam wigwams wild wildcat
wildcats wildcatted wildcatter wildcatting wilded wilder wildest wilding
wildlife wilds will willed willer willes willing willinger willingest willow
willowed willower willowing willows wills win wind winded winder windier
windiest winding window windowed windowing windowpane windowpanes windows
winds windy wine wined winer wines wing winged winger winging wings wining
wink winked winker winking winks winned winner winning wins winter wintered
winterer wintering winters wipe wiped wiper wipes wiping wire wired wirer
wires wiring wise wised wiser wises wisest wish wished wisher wishes wishing
wising witch witched witcher witches witching with withed wither withes
withing without withouts woke wolf wolfed wolfer wolfing wolfs wolves woman
womaned womaning womans women won wonder wondered wonderer wonderful
wonderfuller wondering wonders woning wonned wonner wonning wons wood
woodchuck woodchucks wooded wooden woodener woodenest wooding woodpecker
woodpeckers woods woof woofed woofer woofing woofs wool woold wooled woolen
woolens wooler woolled wools word worded worder wording words wore work
worked worker working workman works world worlded worlds worm wormed wormer
worming worms worn worried worrier worries worry worrying worse worser worses
worst worsted worsting worsts worth worthed worthing worths would wouldest
woulding wound wounded wounder wounding wounds wrap wrapped wrapper wrapping
wraps wreck wrecked wrecker wrecking wrecks wren wrens wrist wristed wrister
wrists write writer writes writing written wrong wronged wronger wrongest
wronging wrongs wrote x-ray xmas xmases yard yarded yarder yarding yards yarn
yarned yarner yarning yarns yawn yawned yawner yawning yawns year yeard
yeared years yell yelled yeller yelling yellow yellowed yellower yellowest
yellowing yellowish yellows yells yes yeses yesterday yesterdays yet yetter
yolk yolked yolks yonder you youd young younger youngest youngs youngster
youngsters your yours yourself yous youth youthes youths zebra zebras zero
zeroed zeroes zeroing zeros zone zoned zoner zones zoning zoo zoos
"""

DALE_CHALL_WORDS = frozenset(_WORDS.split())


def dale_chall_score(n_words: int, n_sentences: int, n_unfamiliar: int) -> int:
    """readability_dale_chall.c:188 — int-truncated 1000x grade."""
    if n_words == 0:
        return 0
    return int(
        1000
        * (
            0.049 * n_words / n_sentences
            + 15.79 * n_unfamiliar / n_words
            + 3.6365
        )
    )
